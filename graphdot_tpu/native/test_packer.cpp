// Host-side C++ self-test of the native packer (the analogue of the
// reference's compiler-only catch2 tests, test/cpp/ — no accelerator
// needed). Build and run:
//   g++ -O2 -o /tmp/test_packer graphdot_tpu/native/test_packer.cpp \
//       graphdot_tpu/native/packer.cpp && /tmp/test_packer

#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <vector>

extern "C" {
void pack_batch_f32(int32_t, const int32_t*, const int64_t*,
                    const int32_t*, const int32_t*, const float*,
                    int32_t, int32_t, float*, float*, float*, int32_t*,
                    int32_t*, float*, int32_t*);
void pack_edge_feature_f32(int32_t, const int64_t*, const int32_t*,
                           const int32_t*, const float*, int32_t,
                           int32_t, float*, float*);
void schedule_jobs_by_cost(int64_t, const int32_t*, const int32_t*,
                           const int32_t*, int64_t*);
}

static int failures = 0;

#define CHECK(cond)                                                     \
    do {                                                                \
        if (!(cond)) {                                                  \
            std::printf("FAIL %s:%d: %s\n", __FILE__, __LINE__, #cond); \
            ++failures;                                                 \
        }                                                               \
    } while (0)

static void test_pack_batch() {
    // graph 0: triangle-ish (3 nodes, 3 edges incl. a self-loop);
    // graph 1: a single edge
    const int32_t n_nodes[] = {3, 2};
    const int64_t offsets[] = {0, 3, 4};
    const int32_t ei[] = {0, 0, 1, 0};
    const int32_t ej[] = {1, 2, 1, 1};  // (1,1) is a self-loop
    const float ew[] = {1.f, 2.f, 4.f, 0.5f};
    const int32_t n_pad = 4, m_pad = 8;

    std::vector<float> adj(2 * n_pad * n_pad, 0.f);
    std::vector<float> deg(2 * n_pad, 0.f), mask(2 * n_pad, 0.f);
    std::vector<int32_t> esrc(2 * m_pad, 0), edst(2 * m_pad, 0);
    std::vector<float> wout(2 * m_pad, 0.f);
    std::vector<int32_t> n_edge(2, 0);

    pack_batch_f32(2, n_nodes, offsets, ei, ej, ew, n_pad, m_pad,
                   adj.data(), deg.data(), mask.data(), esrc.data(),
                   edst.data(), wout.data(), n_edge.data());

    CHECK(adj[0 * n_pad + 1] == 1.f);   // (0,1)
    CHECK(adj[1 * n_pad + 0] == 1.f);   // symmetric
    CHECK(adj[1 * n_pad + 1] == 4.f);   // self-loop on the diagonal
    CHECK(deg[0] == 3.f);               // 1 + 2
    CHECK(deg[1] == 5.f);               // 1 + 4 (self-loop once)
    CHECK(mask[2] == 1.f && mask[3] == 0.f);
    CHECK(n_edge[0] == 5);              // 2 off-diagonal x2 + 1 loop
    CHECK(n_edge[1] == 2);
}

static void test_edge_feature() {
    const int64_t offsets[] = {0, 2};
    const int32_t ei[] = {0, 1};
    const int32_t ej[] = {1, 2};
    const float values[] = {10.f, 20.f};
    const int32_t n_pad = 4, m_pad = 6;
    std::vector<float> mat(n_pad * n_pad, 0.f), elist(m_pad, 0.f);
    pack_edge_feature_f32(1, offsets, ei, ej, values, n_pad, m_pad,
                          mat.data(), elist.data());
    CHECK(mat[0 * n_pad + 1] == 10.f && mat[1 * n_pad + 0] == 10.f);
    CHECK(mat[1 * n_pad + 2] == 20.f);
    CHECK(elist[0] == 10.f && elist[1] == 10.f);
    CHECK(elist[2] == 20.f && elist[3] == 20.f);
}

static void test_schedule() {
    const int32_t i_idx[] = {0, 1, 2, 0};
    const int32_t j_idx[] = {0, 1, 2, 2};
    const int32_t n_nodes[] = {3, 2, 5};
    // costs: 9, 4, 25, 15 -> descending order 2, 3, 0, 1
    int64_t order[4];
    schedule_jobs_by_cost(4, i_idx, j_idx, n_nodes, order);
    CHECK(order[0] == 2 && order[1] == 3);
    CHECK(order[2] == 0 && order[3] == 1);
}

int main() {
    test_pack_batch();
    test_edge_feature();
    test_schedule();
    if (failures == 0) {
        std::printf("native packer self-test: all OK\n");
        return 0;
    }
    std::printf("native packer self-test: %d failure(s)\n", failures);
    return 1;
}
