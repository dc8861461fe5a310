// PixelLink connected-component grouping (union-find with path
// compression + union by rank).
//
// Equivalent semantics to the reference's host-side dict-based
// union-find (pixel_link/pixel_link_decode.py:49-115 and
// postprocess.py func:184-233): positive pixels joined to neighbor n_j
// when the pixel's j-th link is on and the neighbor is positive;
// component ids assigned in first-visit (row-major) order starting
// at 1.
//
// Build: g++ -O2 -shared -fPIC pixellink_cc.cpp -o libgssd_native.so

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {

// neighbor order j=0..7 — offsets the *decoder* follows, matching the
// training shift table's incoming-link convention:
// (-1,-1),(-1,0),(-1,1),(0,1),(1,1),(1,0),(1,-1),(0,-1)
const int DY[8] = {-1, -1, -1, 0, 1, 1, 1, 0};
const int DX[8] = {-1, 0, 1, 1, 1, 0, -1, -1};

struct DSU {
  std::vector<int32_t> parent;
  std::vector<int8_t> rank_;
  explicit DSU(size_t n) : parent(n), rank_(n, 0) {
    for (size_t i = 0; i < n; ++i) parent[i] = static_cast<int32_t>(i);
  }
  int32_t find(int32_t a) {
    int32_t root = a;
    while (parent[root] != root) root = parent[root];
    while (parent[a] != root) {
      int32_t next = parent[a];
      parent[a] = root;
      a = next;
    }
    return root;
  }
  void unite(int32_t a, int32_t b) {
    a = find(a);
    b = find(b);
    if (a == b) return;
    if (rank_[a] < rank_[b]) { int32_t t = a; a = b; b = t; }
    parent[b] = a;
    if (rank_[a] == rank_[b]) ++rank_[a];
  }
};

}  // namespace

extern "C" {

// pixel: [h*w] uint8; link: [8*h*w] uint8; labels_out: [h*w] int32.
// Returns the number of components.
int32_t pixellink_components(const uint8_t* pixel, const uint8_t* link,
                             int32_t h, int32_t w, int32_t* labels_out) {
  const size_t n = static_cast<size_t>(h) * w;
  DSU dsu(n);
  for (int32_t y = 0; y < h; ++y) {
    for (int32_t x = 0; x < w; ++x) {
      const int32_t p = y * w + x;
      if (!pixel[p]) continue;
      for (int j = 0; j < 8; ++j) {
        const int32_t ny = y + DY[j];
        const int32_t nx = x + DX[j];
        if (ny < 0 || nx < 0 || ny >= h || nx >= w) continue;
        const int32_t q = ny * w + nx;
        if (pixel[q] && link[static_cast<size_t>(j) * n + p]) {
          dsu.unite(p, q);
        }
      }
    }
  }
  // assign component ids in row-major first-visit order
  std::vector<int32_t> id_of_root(n, 0);
  int32_t next_id = 0;
  for (size_t p = 0; p < n; ++p) {
    if (!pixel[p]) { labels_out[p] = 0; continue; }
    const int32_t root = dsu.find(static_cast<int32_t>(p));
    if (id_of_root[root] == 0) id_of_root[root] = ++next_id;
    labels_out[p] = id_of_root[root];
  }
  return next_id;
}

}  // extern "C"
