// Software rasterizer inner loop (≙ the role of the reference's native
// render backend around DrawStream replay, gpu_dx12.cpp — here the z-buffered
// triangle fill behind renderer/raster.py, which keeps projection/shading
// vectorized in numpy and hands the per-triangle fill to this kernel).
//
// Exact mirror of raster.py's numpy loop: pixel centers at +0.5, barycentric
// inside-test with the same sign convention, perspective-correct depth via
// 1/z interpolation, z-test, flat color write.
#include <cmath>
#include <cstdint>

extern "C" {

// fb [h*w*3] f32, zb [h*w] f32 (view depth, +inf = empty)
// tv [t*3*2] screen xy, tz [t*3] view depth (>0 for kept tris)
// cols [t*3] rgb per triangle. Returns pixels written.
int lxt_raster_tris(float* fb, float* zb, int w, int h,
                    const float* tv, const float* tz, const float* cols,
                    int t_count) {
    int written = 0;
    for (int t = 0; t < t_count; ++t) {
        const float ax = tv[t * 6 + 0], ay = tv[t * 6 + 1];
        const float bx = tv[t * 6 + 2], by = tv[t * 6 + 3];
        const float cx = tv[t * 6 + 4], cy = tv[t * 6 + 5];
        const float za = tz[t * 3 + 0], zb_ = tz[t * 3 + 1],
                    zc = tz[t * 3 + 2];
        const float r = cols[t * 3 + 0], g = cols[t * 3 + 1],
                    b = cols[t * 3 + 2];

        float minx = ax < bx ? ax : bx; minx = minx < cx ? minx : cx;
        float maxx = ax > bx ? ax : bx; maxx = maxx > cx ? maxx : cx;
        float miny = ay < by ? ay : by; miny = miny < cy ? miny : cy;
        float maxy = ay > by ? ay : by; maxy = maxy > cy ? maxy : cy;
        int x0 = (int)std::floor(minx); if (x0 < 0) x0 = 0;
        int x1 = (int)std::ceil(maxx) + 1; if (x1 > w) x1 = w;
        int y0 = (int)std::floor(miny); if (y0 < 0) y0 = 0;
        int y1 = (int)std::ceil(maxy) + 1; if (y1 > h) y1 = h;
        if (x0 >= x1 || y0 >= y1) continue;

        const float d = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax);
        if (std::fabs(d) < 1e-9f) continue;
        const float inv_d = 1.0f / d;
        const float iza = 1.0f / za, izb = 1.0f / zb_, izc = 1.0f / zc;

        for (int y = y0; y < y1; ++y) {
            const float py = (float)y + 0.5f;
            float* zrow = zb + (size_t)y * w;
            float* frow = fb + (size_t)y * w * 3;
            for (int x = x0; x < x1; ++x) {
                const float px = (float)x + 0.5f;
                const float w0 = ((bx - px) * (cy - py)
                                  - (by - py) * (cx - px)) * inv_d;
                const float w1 = ((cx - px) * (ay - py)
                                  - (cy - py) * (ax - px)) * inv_d;
                const float w2 = 1.0f - w0 - w1;
                if (w0 < 0.0f || w1 < 0.0f || w2 < 0.0f) continue;
                float iz = w0 * iza + w1 * izb + w2 * izc;
                if (iz < 1e-9f) iz = 1e-9f;
                const float z = 1.0f / iz;
                if (z >= zrow[x]) continue;
                zrow[x] = z;
                frow[x * 3 + 0] = r;
                frow[x * 3 + 1] = g;
                frow[x * 3 + 2] = b;
                ++written;
            }
        }
    }
    return written;
}

}  // extern "C"
