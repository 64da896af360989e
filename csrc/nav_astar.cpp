// Grid A* pathfinder — the native host-side pathfinding core
// (≙ the reference's Recast/Detour native navigation; lumixengine_tpu's
// zones are walkable grids, see navigation/module.py).
//
// 8-connected A* with no corner cutting, octile heuristic, binary-heap open
// list. Exposed via ctypes (utils/native.py); navigation/module.py uses it
// when built, falling back to the Python implementation otherwise.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

struct Node {
    float f;
    int idx;
};

struct Heap {
    std::vector<Node> v;
    void push(Node n) {
        v.push_back(n);
        int i = (int)v.size() - 1;
        while (i > 0) {
            int p = (i - 1) / 2;
            if (v[p].f <= v[i].f) break;
            std::swap(v[p], v[i]);
            i = p;
        }
    }
    Node pop() {
        Node top = v[0];
        v[0] = v.back();
        v.pop_back();
        int i = 0;
        int n = (int)v.size();
        while (true) {
            int l = 2 * i + 1, r = 2 * i + 2, m = i;
            if (l < n && v[l].f < v[m].f) m = l;
            if (r < n && v[r].f < v[m].f) m = r;
            if (m == i) break;
            std::swap(v[m], v[i]);
            i = m;
        }
        return top;
    }
    bool empty() const { return v.empty(); }
};

}  // namespace

extern "C" {

// walkable: h*w bytes (1 = walkable). Returns path length (cells) or -1.
// out_xz: caller buffer for up to max_out (x, z) int32 pairs, start → goal.
int lxt_nav_astar(const uint8_t* walkable, int w, int h,
                  int sx, int sz, int gx, int gz,
                  int32_t* out_xz, int max_out) {
    if (sx < 0 || sx >= w || sz < 0 || sz >= h) return -1;
    if (gx < 0 || gx >= w || gz < 0 || gz >= h) return -1;
    if (!walkable[sz * w + sx] || !walkable[gz * w + gx]) return -1;
    const int n = w * h;
    std::vector<float> cost(n, 1e30f);
    std::vector<int32_t> came(n, -1);
    std::vector<uint8_t> closed(n, 0);
    Heap open;
    const int start = sz * w + sx;
    const int goal = gz * w + gx;
    cost[start] = 0.0f;
    open.push({0.0f, start});

    static const int DX[8] = {1, -1, 0, 0, 1, 1, -1, -1};
    static const int DZ[8] = {0, 0, 1, -1, 1, -1, 1, -1};
    static const float DC[8] = {1, 1, 1, 1, 1.41421356f, 1.41421356f,
                                1.41421356f, 1.41421356f};

    bool found = false;
    while (!open.empty()) {
        Node cur = open.pop();
        if (cur.idx == goal) { found = true; break; }
        if (closed[cur.idx]) continue;
        closed[cur.idx] = 1;
        const int cx = cur.idx % w;
        const int cz = cur.idx / w;
        for (int k = 0; k < 8; ++k) {
            const int nx = cx + DX[k];
            const int nz = cz + DZ[k];
            if (nx < 0 || nx >= w || nz < 0 || nz >= h) continue;
            const int ni = nz * w + nx;
            if (!walkable[ni] || closed[ni]) continue;
            if (k >= 4) {  // no corner cutting
                if (!walkable[cz * w + nx] || !walkable[nz * w + cx]) continue;
            }
            const float nc = cost[cur.idx] + DC[k];
            if (nc < cost[ni]) {
                cost[ni] = nc;
                came[ni] = cur.idx;
                // octile heuristic
                const float dx = (float)std::abs(nx - gx);
                const float dz = (float)std::abs(nz - gz);
                const float hh = (dx > dz)
                    ? (dx - dz) + 1.41421356f * dz
                    : (dz - dx) + 1.41421356f * dx;
                open.push({nc + hh, ni});
            }
        }
    }
    if (!found) return -1;
    // reconstruct (goal → start), then reverse into out
    std::vector<int32_t> rev;
    for (int i = goal; i != -1; i = came[i]) rev.push_back(i);
    const int len = (int)rev.size();
    const int emit = len < max_out ? len : max_out;
    for (int i = 0; i < emit; ++i) {
        const int idx = rev[len - 1 - i];
        out_xz[2 * i] = idx % w;
        out_xz[2 * i + 1] = idx / w;
    }
    return emit;
}

}  // extern "C"
