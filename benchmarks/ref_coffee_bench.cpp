// Large-scene benchmark for the C++ reference: the coffee-machine
// stand-in (scenes/coffee/coffee_standin.yaml), 91,540 triangles.
//
// Mirrors the stand-in YAML exactly using the reference's own semantics
// (scene_loader.h:345-397 fan-triangulated flat OBJ loading;
// build_material's 0-255 color scaling, scene_loader.h:81-127; lights
// as linear HDR emission) — but constructs the scene directly because
// yaml-cpp is not available on this host.  Rendering and ray counting
// use the reference's own camera/bvh headers, same as ref_bench.cpp.
//
// Build: benchmarks/build_ref_coffee.sh
// Usage: ref_coffee_bench [width] [spp] [depth] [pt|bdpt] [objdir]

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

// OBJ loading with the reference's exact semantics
// (scene_loader.h:345-397): v/f lines only, 1-based + negative indices,
// fan triangulation, flat triangles.
static void load_obj(const std::string& path,
                     const std::shared_ptr<material>& mat,
                     triangle_collection& world) {
    std::ifstream in(path);
    if (!in) {
        std::fprintf(stderr, "cannot open %s\n", path.c_str());
        std::exit(1);
    }
    std::vector<point3> verts;
    std::string line;
    while (std::getline(in, line)) {
        if (line.empty()) continue;
        std::istringstream ss(line);
        std::string tag;
        ss >> tag;
        if (tag == "v") {
            double x, y, z;
            if (ss >> x >> y >> z) verts.emplace_back(x, y, z);
        } else if (tag == "f") {
            std::vector<int> f;
            std::string tok;
            while (ss >> tok) {
                size_t slash = tok.find('/');
                std::string vi = (slash == std::string::npos)
                                     ? tok : tok.substr(0, slash);
                try {
                    int v = std::stoi(vi);
                    f.push_back(v > 0 ? v - 1
                                      : static_cast<int>(verts.size()) + v);
                } catch (...) {}
            }
            for (size_t k = 2; k < f.size(); ++k)
                world.add(triangle(verts.at(f[0]), verts.at(f[k - 1]),
                                   verts.at(f[k]), mat));
        }
    }
}

static void add_quad(triangle_collection& c, point3 a, point3 b, point3 d,
                     point3 e, const std::shared_ptr<material>& m) {
    c.add(triangle(a, b, d, m));
    c.add(triangle(a, d, e, m));
}

int main(int argc, char** argv) {
    int width = argc > 1 ? std::atoi(argv[1]) : 512;
    int spp = argc > 2 ? std::atoi(argv[2]) : 16;
    int depth = argc > 3 ? std::atoi(argv[3]) : 10;
    std::string mode = argc > 4 ? argv[4] : "pt";
    std::string dir = argc > 5 ? argv[5] : "scenes/coffee/data";

    const double s = 1.0 / 255.0;
    auto orange = make_shared<lambertian>(color(255 * s, 97 * s, 3 * s));
    auto black = make_shared<lambertian>(color(0, 0, 0));
    auto glass = make_shared<dielectric>(1.5);
    auto metal_m = make_shared<metal>(color(170 * s, 170 * s, 170 * s), 0.1);
    auto floor_m = make_shared<lambertian>(color(147 * s, 147 * s, 147 * s));
    // type: light -> linear HDR emission, NO 0-255 scaling
    // (scene_loader.h:124-127)
    auto light = make_shared<diffuse_light>(color(245, 245, 245));

    triangle_collection world;
    load_obj(dir + "/Plastic_Orange.obj", orange, world);
    load_obj(dir + "/Plastic_Black.obj", black, world);
    load_obj(dir + "/Metal.obj", metal_m, world);
    load_obj(dir + "/Glass.obj", glass, world);
    load_obj(dir + "/Floor.obj", floor_m, world);

    triangle_collection light_tris;
    // quads go to BOTH collections (add_triangle_with_lights semantics,
    // scene_loader.h:190-203); tris is private so add twice
    for (triangle_collection* c : {&world, &light_tris}) {
        add_quad(*c, point3(-0.359309, 0.449693, -0.010809),
                 point3(-0.196537, 0.449693, 0.338256),
                 point3(-0.196537, 0.000849009, 0.338256),
                 point3(-0.359309, 0.000848979, -0.010809), light);
        add_quad(*c, point3(0.320673, 0.027337, 0.228975),
                 point3(0.320673, 0.476182, 0.228975),
                 point3(0.325221, 0.476182, -0.136419),
                 point3(0.325221, 0.027337, -0.136419), light);
        add_quad(*c, point3(0.230128, 0.50385, 0.267372),
                 point3(-0.230128, 0.50385, 0.267372),
                 point3(-0.230128, 0.50385, -0.192885),
                 point3(0.230128, 0.50385, -0.192885), light);
    }

    camera cam;
    cam.aspect_ratio = 1.0;
    cam.image_width = width;
    cam.samples_per_pixel = spp;
    cam.max_depth = depth;
    cam.background = color(0, 0, 0);
    cam.vfov = 30;
    cam.lookfrom = point3(-0.02, 0.22, 0.85);
    cam.lookat = point3(0.0, 0.16, 0.02);
    cam.vup = vec3(0, 1, 0);
    cam.defocus_angle = 0;
    cam.file_name = "ref_coffee.png";

    std::fprintf(stderr, "triangles: %zu\n", world.size());
    auto world_bvh = make_shared<bvh_node>(world.to_hittable_list());
    hittable_list light_list = light_tris.to_hittable_list();

    auto t0 = std::chrono::steady_clock::now();
    if (mode == "pt") {
        cam.render(*world_bvh, light_list);
    } else {
        cam.render(*world_bvh, light_tris);
    }
    double wall = std::chrono::duration<double>(
                      std::chrono::steady_clock::now() - t0).count();
    unsigned long long rays =
        bvh_stats().rays_traced.load(std::memory_order_relaxed);
    std::printf(
        "{\"scene\": \"coffee_standin\", \"mode\": \"%s\", \"width\": %d, "
        "\"spp\": %d, \"depth\": %d, \"rays\": %llu, \"wall_s\": %.3f, "
        "\"mrays_per_sec\": %.3f}\n",
        mode.c_str(), width, spp, depth, rays, wall, rays / wall / 1e6);
    return 0;
}
