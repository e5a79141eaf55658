// Renders the glass stand-in scene (scenes/glass/glass_standin.yaml)
// through the C++ reference's OWN camera/integrator/BVH/material headers
// (read-only -I includes; nothing copied), for end-to-end RMSE
// validation of the north-star scene class against the real binary.
//
// The reference's YAML loader needs yaml-cpp, which is not installed in
// this image, so the scene setup (materials, camera, OBJ meshes, light
// quad) is replicated here in plain C++ — the OBJ parsing below is OUR
// code, written to the same minimal semantics as the reference's
// load_obj_file (v/f lines only, 1-based and negative indices, fan
// triangulation; scene_loader.h:345-397).
//
// Build: REF=/root/reference sh benchmarks/build_ref_glass.sh
// Usage: ref_glass_bench [width] [spp] [depth] [pt|bdpt] [sceneDir]

#include "main.h"

#include "bvh.h"
#include "camera.h"
#include "hittable.h"
#include "material.h"
#include "triangle.h"

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

static void add_obj(triangle_collection& world, const std::string& path,
                    shared_ptr<material> mat) {
    std::ifstream in(path);
    if (!in) {
        std::fprintf(stderr, "cannot open %s\n", path.c_str());
        std::exit(1);
    }
    std::vector<point3> verts;
    std::string line;
    size_t ntris = 0;
    while (std::getline(in, line)) {
        std::istringstream ss(line);
        std::string tok;
        if (!(ss >> tok)) continue;
        if (tok == "v") {
            double x, y, z;
            if (ss >> x >> y >> z) verts.emplace_back(x, y, z);
        } else if (tok == "f") {
            std::vector<long> idx;
            std::string f;
            while (ss >> f) {
                // vi, vi/vt, vi/vt/vn, vi//vn — only vi used
                long vi = std::strtol(f.c_str(), nullptr, 10);
                if (vi < 0) vi = (long)verts.size() + vi + 1;
                if (vi >= 1 && vi <= (long)verts.size()) idx.push_back(vi - 1);
            }
            for (size_t k = 2; k < idx.size(); ++k) {  // fan triangulation
                world.add(triangle(verts[idx[0]], verts[idx[k - 1]],
                                   verts[idx[k]], mat));
                ++ntris;
            }
        }
    }
    std::fprintf(stderr, "%s: %zu tris\n", path.c_str(), ntris);
}

int main(int argc, char** argv) {
    int width = argc > 1 ? std::atoi(argv[1]) : 640;
    int spp = argc > 2 ? std::atoi(argv[2]) : 16;
    int depth = argc > 3 ? std::atoi(argv[3]) : 80;
    std::string mode = argc > 4 ? argv[4] : "pt";
    std::string dir = argc > 5 ? argv[5] : "scenes/glass/data";

    // materials exactly as our loader maps glass_standin.yaml
    // (0-255 color autoscale /255; emission linear, unscaled)
    auto backdrop = make_shared<metal>(color(147/255.0, 147/255.0, 147/255.0), 0.1);
    auto floor_m  = make_shared<lambertian>(color(180/255.0, 180/255.0, 180/255.0));
    auto water    = make_shared<dielectric>(1.33);
    auto ice_air  = make_shared<dielectric>(1.31);
    auto glass    = make_shared<dielectric>(1.5);
    auto air_ice  = make_shared<dielectric>(0.763);
    auto light    = make_shared<diffuse_light>(color(15.9155, 27.0563, 31.831));

    triangle_collection world;
    add_obj(world, dir + "/glass.obj", glass);
    add_obj(world, dir + "/water.obj", water);
    add_obj(world, dir + "/ice1.obj", ice_air);
    add_obj(world, dir + "/ice2.obj", air_ice);
    add_obj(world, dir + "/floor.obj", floor_m);
    add_obj(world, dir + "/backdrop.obj", backdrop);

    // light quad, wound to face down (one-sided emitter)
    const point3 l0(-6, 14, 6), l1(6, 14, 6), l2(6, 14, -6), l3(-6, 14, -6);
    world.add(triangle(l0, l2, l1, light));
    world.add(triangle(l0, l3, l2, light));

    triangle_collection light_tris;
    light_tris.add(triangle(l0, l2, l1, light));
    light_tris.add(triangle(l0, l3, l2, light));

    camera cam;
    cam.aspect_ratio = 1280.0 / 720.0;
    cam.image_width = width;
    cam.samples_per_pixel = spp;
    cam.max_depth = depth;
    cam.background = color(0, 0, 0);
    cam.vfov = 35;
    cam.lookfrom = point3(0.0, 2.7, 25.7);
    cam.lookat = point3(0.0, 3.1, 0.0);
    cam.vup = vec3(0, 1, 0);
    cam.file_name = "ref_glass.png";

    reset_bvh_stats();
    auto world_bvh = make_shared<bvh_node>(world.to_hittable_list());

    auto t0 = std::chrono::steady_clock::now();
    if (mode == "bdpt") {
        cam.render(*world_bvh, light_tris);  // collection -> BDPT path
    } else {
        // list -> dynamic_cast fails -> path_trace_color (PT)
        hittable_list light_list = light_tris.to_hittable_list();
        cam.render(*world_bvh, light_list);
    }
    auto t1 = std::chrono::steady_clock::now();
    double secs = std::chrono::duration<double>(t1 - t0).count();
    long rays = (long)bvh_stats().rays_traced.load();
    std::printf("{\"mode\": \"%s\", \"width\": %d, \"spp\": %d, "
                "\"depth\": %d, \"rays\": %ld, \"wall_s\": %.3f, "
                "\"mrays\": %.4f}\n",
                mode.c_str(), width, spp, depth, rays, secs,
                rays / secs / 1e6);
    return 0;
}
