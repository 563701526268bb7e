// Fast-marching eikonal solver on a regular 3-D grid.
//
// Native replacement for the reference's scikit-fmm dependency
// (calculate_travel_times_3D_build_data.py:58-59, `skfmm.travel_time`):
// first-order upwind Godunov update with a binary min-heap, solving
// |grad T| = 1/v for first-arrival travel times from a point source.
//
// Exposed C ABI (ctypes):
//   fast_march(vel, nx, ny, nz, h, seed_idx, seed_t, n_seed, T_out)
//     vel     : nx*ny*nz float32 velocities (m/s), C-order (i*ny*nz + j*nz + k)
//     h       : grid spacing (m), uniform
//     seed_idx: n_seed flat indices with known initial times seed_t (s)
//     T_out   : nx*ny*nz float32 output travel times (s)
//
// Build: g++ -O3 -march=native -shared -fPIC fast_marching.cpp -o libfmm.so

#include <cmath>
#include <cstdint>
#include <queue>
#include <vector>
#include <limits>

namespace {

struct Node {
    float t;
    int64_t idx;
    bool operator>(const Node& o) const { return t > o.t; }
};

struct AxisTerm {
    float a;       // effective upwind value
    float alpha;   // quadratic weight (1 first-order, 9/4 second-order)
    bool valid;
};

// Solve sum_i alpha_i * max(T - a_i, 0)^2 = f^2 (second-order Godunov
// update, the scheme skfmm uses by default). Terms are tried in ascending
// a order; a term only participates if T > a_i.
inline float solve_update(AxisTerm t0, AxisTerm t1, AxisTerm t2, float f) {
    AxisTerm terms[3] = {t0, t1, t2};
    // sort valid terms ascending by a
    for (int i = 0; i < 3; ++i)
        for (int j = i + 1; j < 3; ++j)
            if ((!terms[i].valid && terms[j].valid) ||
                (terms[i].valid && terms[j].valid && terms[j].a < terms[i].a))
                std::swap(terms[i], terms[j]);

    const float INF = std::numeric_limits<float>::infinity();
    float best = INF;
    float A = 0.0f, B = 0.0f, C = -f * f;
    for (int m = 0; m < 3; ++m) {
        if (!terms[m].valid) break;
        A += terms[m].alpha;
        B += terms[m].alpha * terms[m].a;
        C += terms[m].alpha * terms[m].a * terms[m].a;
        float disc = B * B - A * C;
        if (disc < 0.0f) break;
        float t = (B + std::sqrt(disc)) / A;
        // consistency: T must exceed every included upwind value, and not
        // exceed the next (otherwise the next term must be included too)
        if (t < terms[m].a) break;
        if (m + 1 < 3 && terms[m + 1].valid && t > terms[m + 1].a) continue;
        best = t;
        break;
    }
    if (best == INF && terms[0].valid)
        best = terms[0].a + f / std::sqrt(terms[0].alpha);
    return best;
}

}  // namespace

extern "C" void fast_march(const float* vel, int nx, int ny, int nz, float h,
                           const int64_t* seed_idx, const float* seed_t,
                           int n_seed, float* T) {
    const int64_t n = (int64_t)nx * ny * nz;
    const float INF = std::numeric_limits<float>::infinity();
    std::vector<uint8_t> state(n, 0);  // 0=far, 1=trial, 2=accepted
    for (int64_t i = 0; i < n; ++i) T[i] = INF;

    std::priority_queue<Node, std::vector<Node>, std::greater<Node>> heap;
    for (int s = 0; s < n_seed; ++s) {
        int64_t idx = seed_idx[s];
        if (seed_t[s] < T[idx]) {
            T[idx] = seed_t[s];
            heap.push({seed_t[s], idx});
            state[idx] = 1;
        }
    }

    const int64_t strides[3] = {(int64_t)ny * nz, (int64_t)nz, 1};
    const int dims[3] = {nx, ny, nz};

    while (!heap.empty()) {
        Node cur = heap.top();
        heap.pop();
        if (state[cur.idx] == 2) continue;
        state[cur.idx] = 2;

        int ci = (int)(cur.idx / strides[0]);
        int cj = (int)((cur.idx / strides[1]) % ny);
        int ck = (int)(cur.idx % nz);
        const int coord[3] = {ci, cj, ck};

        for (int ax = 0; ax < 3; ++ax) {
            for (int dir = -1; dir <= 1; dir += 2) {
                int c = coord[ax] + dir;
                if (c < 0 || c >= dims[ax]) continue;
                int64_t nb = cur.idx + dir * strides[ax];
                if (state[nb] == 2) continue;

                // second-order upwind terms per axis
                AxisTerm terms[3];
                int ni = (ax == 0) ? c : ci;
                int nj = (ax == 1) ? c : cj;
                int nk = (ax == 2) ? c : ck;
                const int ncoord[3] = {ni, nj, nk};
                for (int a2 = 0; a2 < 3; ++a2) {
                    terms[a2].valid = false;
                    terms[a2].a = INF;
                    terms[a2].alpha = 1.0f;
                    for (int d2 = -1; d2 <= 1; d2 += 2) {
                        int c1 = ncoord[a2] + d2;
                        if (c1 < 0 || c1 >= dims[a2]) continue;
                        int64_t n1 = nb + d2 * strides[a2];
                        if (state[n1] != 2) continue;
                        float t1 = T[n1];
                        float a_eff = t1, alpha = 1.0f;
                        int c2 = ncoord[a2] + 2 * d2;
                        if (c2 >= 0 && c2 < dims[a2]) {
                            int64_t n2 = nb + 2 * d2 * strides[a2];
                            if (state[n2] == 2 && T[n2] <= t1) {
                                a_eff = (4.0f * t1 - T[n2]) / 3.0f;
                                alpha = 2.25f;
                            }
                        }
                        // pick the better (smaller effective value) side
                        if (!terms[a2].valid || a_eff < terms[a2].a) {
                            terms[a2].valid = true;
                            terms[a2].a = a_eff;
                            terms[a2].alpha = alpha;
                        }
                    }
                }
                float f = h / vel[nb];
                float t_new = solve_update(terms[0], terms[1], terms[2], f);
                if (t_new < T[nb]) {
                    T[nb] = t_new;
                    heap.push({t_new, nb});
                    state[nb] = 1;
                }
            }
        }
    }
}
