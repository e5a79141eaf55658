// Benchmark harness for the C++ reference (teehee567/Bidirectional-Path-Tracer).
//
// The reference publishes no numbers (see BASELINE.md), so this harness
// compiles the reference's own headers (read-only, via -I include paths —
// nothing is copied into this repo) and measures Mrays/sec on the cornell
// box at a configurable size/spp/depth, for both of its integrators:
//   - bdpt: lights passed as a triangle_collection (the de-facto path,
//     src/camera.h:245-253), with a REAL light material instead of the
//     reference main.cpp's null-material lights (which null-derefs in
//     build_light_path, camera.h:394)
//   - pt:   lights passed as a hittable_list so the dynamic_cast fails and
//     ray_color falls back to path_trace_color
//
// Build (see benchmarks/build_ref_bench.sh):
//   g++ -O3 -march=native -std=c++17 ref_bench.cpp -o ref_bench \
//       -I$REF/src -I$REF/src/core ... -lpng -lpthread
// Usage: ref_bench [width] [spp] [depth] [pt|bdpt]

#include "main.h"

#include "bvh.h"
#include "camera.h"
#include "hittable.h"
#include "material.h"
#include "triangle.h"

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <string>

int main(int argc, char** argv) {
    int width = argc > 1 ? std::atoi(argv[1]) : 512;
    int spp = argc > 2 ? std::atoi(argv[2]) : 16;
    int depth = argc > 3 ? std::atoi(argv[3]) : 10;
    std::string mode = argc > 4 ? argv[4] : "bdpt";

    triangle_collection world;
    auto red = make_shared<lambertian>(color(.65, .05, .05));
    auto white = make_shared<lambertian>(color(.73, .73, .73));
    auto green = make_shared<lambertian>(color(.12, .45, .15));
    auto light = make_shared<diffuse_light>(color(15, 15, 15));

    add_quad_triangles(world, point3(555, 0, 0), vec3(0, 0, 555), vec3(0, 555, 0), green);
    add_quad_triangles(world, point3(0, 0, 555), vec3(0, 0, -555), vec3(0, 555, 0), red);
    add_quad_triangles(world, point3(0, 555, 0), vec3(555, 0, 0), vec3(0, 0, 555), white);
    add_quad_triangles(world, point3(0, 0, 555), vec3(555, 0, 0), vec3(0, 0, -555), white);
    add_quad_triangles(world, point3(555, 0, 555), vec3(-555, 0, 0), vec3(0, 555, 0), white);
    add_quad_triangles(world, point3(213, 554, 227), vec3(130, 0, 0), vec3(0, 0, 105), light);
    add_box_triangles(world, point3(0, 0, 0), point3(165, 330, 165), white, 15.0,
                      vec3(265, 0, 295));

    // lights with the REAL material (fixes the reference main.cpp bug)
    triangle_collection light_tris;
    add_quad_triangles(light_tris, point3(213, 554, 227), vec3(130, 0, 0),
                       vec3(0, 0, 105), light);

    camera cam;
    cam.aspect_ratio = 1.0;
    cam.image_width = width;
    cam.samples_per_pixel = spp;
    cam.max_depth = depth;
    cam.background = color(0, 0, 0);
    cam.vfov = 40;
    cam.lookfrom = point3(278, 278, -800);
    cam.lookat = point3(278, 278, 0);
    cam.vup = vec3(0, 1, 0);
    cam.defocus_angle = 0;
    cam.file_name = "ref_bench.png";

    auto world_bvh = make_shared<bvh_node>(world.to_hittable_list());

    // pt mode: wrap the light triangles in a hittable_list so the
    // dynamic_cast<triangle_collection*> in ray_color fails
    hittable_list light_list = light_tris.to_hittable_list();

    auto t0 = std::chrono::steady_clock::now();
    if (mode == "pt") {
        cam.render(*world_bvh, light_list);
    } else {
        cam.render(*world_bvh, light_tris);
    }
    double wall =
        std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();

    unsigned long long rays =
        bvh_stats().rays_traced.load(std::memory_order_relaxed);
    std::printf(
        "{\"mode\": \"%s\", \"width\": %d, \"spp\": %d, \"depth\": %d, "
        "\"rays\": %llu, \"wall_s\": %.3f, \"mrays_per_sec\": %.3f}\n",
        mode.c_str(), width, spp, depth, rays, wall, rays / wall / 1e6);
    return 0;
}
