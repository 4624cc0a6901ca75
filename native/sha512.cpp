// Batched SHA-512 for the Ed25519 host-side hashing path.
//
// Native counterpart of the reference's cryptoxide SHA-512 dependency
// (/root/reference/src/protocol/ed25519.rs:11-17): the TPU framework keeps
// hashing on the host CPU (variable-length, byte-granular work the MXU/VPU
// cannot express profitably) and overlaps it with device compute. This
// implementation hashes B independent messages across a thread pool.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libsha512.so sha512.cpp -lpthread -ldl

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>
#include <dlfcn.h>

namespace {

// OpenSSL EVP fast path, bound at runtime via dlopen (no dev headers in the
// image; the EVP_Digest ABI is stable).
typedef const void* (*evp_sha512_fn)(void);
typedef int (*evp_digest_fn)(const void*, size_t, unsigned char*,
                             unsigned int*, const void*, void*);
static evp_sha512_fn g_evp_sha512 = nullptr;
static evp_digest_fn g_evp_digest = nullptr;
static bool g_evp_tried = false;

void init_evp() {
  if (g_evp_tried) return;
  g_evp_tried = true;
  void* h = dlopen("libcrypto.so.3", RTLD_NOW | RTLD_GLOBAL);
  if (!h) h = dlopen("libcrypto.so.1.1", RTLD_NOW | RTLD_GLOBAL);
  if (!h) return;
  g_evp_sha512 = (evp_sha512_fn)dlsym(h, "EVP_sha512");
  g_evp_digest = (evp_digest_fn)dlsym(h, "EVP_Digest");
  if (!g_evp_sha512 || !g_evp_digest) {
    g_evp_sha512 = nullptr;
    g_evp_digest = nullptr;
  }
}

static const uint64_t K[80] = {
    0x428a2f98d728ae22ULL, 0x7137449123ef65cdULL, 0xb5c0fbcfec4d3b2fULL,
    0xe9b5dba58189dbbcULL, 0x3956c25bf348b538ULL, 0x59f111f1b605d019ULL,
    0x923f82a4af194f9bULL, 0xab1c5ed5da6d8118ULL, 0xd807aa98a3030242ULL,
    0x12835b0145706fbeULL, 0x243185be4ee4b28cULL, 0x550c7dc3d5ffb4e2ULL,
    0x72be5d74f27b896fULL, 0x80deb1fe3b1696b1ULL, 0x9bdc06a725c71235ULL,
    0xc19bf174cf692694ULL, 0xe49b69c19ef14ad2ULL, 0xefbe4786384f25e3ULL,
    0x0fc19dc68b8cd5b5ULL, 0x240ca1cc77ac9c65ULL, 0x2de92c6f592b0275ULL,
    0x4a7484aa6ea6e483ULL, 0x5cb0a9dcbd41fbd4ULL, 0x76f988da831153b5ULL,
    0x983e5152ee66dfabULL, 0xa831c66d2db43210ULL, 0xb00327c898fb213fULL,
    0xbf597fc7beef0ee4ULL, 0xc6e00bf33da88fc2ULL, 0xd5a79147930aa725ULL,
    0x06ca6351e003826fULL, 0x142929670a0e6e70ULL, 0x27b70a8546d22ffcULL,
    0x2e1b21385c26c926ULL, 0x4d2c6dfc5ac42aedULL, 0x53380d139d95b3dfULL,
    0x650a73548baf63deULL, 0x766a0abb3c77b2a8ULL, 0x81c2c92e47edaee6ULL,
    0x92722c851482353bULL, 0xa2bfe8a14cf10364ULL, 0xa81a664bbc423001ULL,
    0xc24b8b70d0f89791ULL, 0xc76c51a30654be30ULL, 0xd192e819d6ef5218ULL,
    0xd69906245565a910ULL, 0xf40e35855771202aULL, 0x106aa07032bbd1b8ULL,
    0x19a4c116b8d2d0c8ULL, 0x1e376c085141ab53ULL, 0x2748774cdf8eeb99ULL,
    0x34b0bcb5e19b48a8ULL, 0x391c0cb3c5c95a63ULL, 0x4ed8aa4ae3418acbULL,
    0x5b9cca4f7763e373ULL, 0x682e6ff3d6b2b8a3ULL, 0x748f82ee5defb2fcULL,
    0x78a5636f43172f60ULL, 0x84c87814a1f0ab72ULL, 0x8cc702081a6439ecULL,
    0x90befffa23631e28ULL, 0xa4506cebde82bde9ULL, 0xbef9a3f7b2c67915ULL,
    0xc67178f2e372532bULL, 0xca273eceea26619cULL, 0xd186b8c721c0c207ULL,
    0xeada7dd6cde0eb1eULL, 0xf57d4f7fee6ed178ULL, 0x06f067aa72176fbaULL,
    0x0a637dc5a2c898a6ULL, 0x113f9804bef90daeULL, 0x1b710b35131c471bULL,
    0x28db77f523047d84ULL, 0x32caab7b40c72493ULL, 0x3c9ebe0a15c9bebcULL,
    0x431d67c49c100d4cULL, 0x4cc5d4becb3e42b6ULL, 0x597f299cfc657e2aULL,
    0x5fcb6fab3ad6faecULL, 0x6c44198c4a475817ULL};

inline uint64_t rotr(uint64_t x, int n) { return (x >> n) | (x << (64 - n)); }
inline uint64_t load_be(const uint8_t* p) {
  uint64_t v = 0;
  for (int i = 0; i < 8; i++) v = (v << 8) | p[i];
  return v;
}
inline void store_be(uint8_t* p, uint64_t v) {
  for (int i = 7; i >= 0; i--) { p[i] = (uint8_t)v; v >>= 8; }
}

void sha512_one(const uint8_t* msg, uint64_t len, uint8_t* out) {
  uint64_t h[8] = {0x6a09e667f3bcc908ULL, 0xbb67ae8584caa73bULL,
                   0x3c6ef372fe94f82bULL, 0xa54ff53a5f1d36f1ULL,
                   0x510e527fade682d1ULL, 0x9b05688c2b3e6c1fULL,
                   0x1f83d9abfb41bd6bULL, 0x5be0cd19137e2179ULL};
  // padded length
  uint64_t total = len + 1 + 16;
  uint64_t nblocks = (total + 127) / 128;
  std::vector<uint8_t> last(256, 0);
  uint64_t full = len / 128;
  uint64_t rem = len - full * 128;
  memcpy(last.data(), msg + full * 128, rem);
  last[rem] = 0x80;
  uint64_t tail_blocks = nblocks - full;
  // bit length into the final 16 bytes (128-bit BE; low 64 bits suffice)
  store_be(last.data() + tail_blocks * 128 - 8, len * 8);

  uint64_t w[80];
  for (uint64_t blk = 0; blk < nblocks; blk++) {
    const uint8_t* p =
        blk < full ? msg + blk * 128 : last.data() + (blk - full) * 128;
    for (int i = 0; i < 16; i++) w[i] = load_be(p + 8 * i);
    for (int i = 16; i < 80; i++) {
      uint64_t s0 = rotr(w[i - 15], 1) ^ rotr(w[i - 15], 8) ^ (w[i - 15] >> 7);
      uint64_t s1 = rotr(w[i - 2], 19) ^ rotr(w[i - 2], 61) ^ (w[i - 2] >> 6);
      w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    uint64_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4], f = h[5],
             g = h[6], hh = h[7];
    for (int i = 0; i < 80; i++) {
      uint64_t S1 = rotr(e, 14) ^ rotr(e, 18) ^ rotr(e, 41);
      uint64_t ch = (e & f) ^ (~e & g);
      uint64_t t1 = hh + S1 + ch + K[i] + w[i];
      uint64_t S0 = rotr(a, 28) ^ rotr(a, 34) ^ rotr(a, 39);
      uint64_t maj = (a & b) ^ (a & c) ^ (b & c);
      uint64_t t2 = S0 + maj;
      hh = g; g = f; f = e; e = d + t1;
      d = c; c = b; b = a; a = t1 + t2;
    }
    h[0] += a; h[1] += b; h[2] += c; h[3] += d;
    h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
  }
  for (int i = 0; i < 8; i++) store_be(out + 8 * i, h[i]);
}

}  // namespace

extern "C" {

// Hash B messages. msgs: concatenated bytes; offsets: B+1 entries into msgs;
// out: B * 64 bytes. nthreads <= 0 -> hardware concurrency.
void sha512_batch(const uint8_t* msgs, const uint64_t* offsets, int64_t n,
                  uint8_t* out, int nthreads) {
  init_evp();
  if (nthreads <= 0) nthreads = (int)std::thread::hardware_concurrency();
  nthreads = std::max(1, std::min<int>(nthreads, 64));
  if (n < 512) nthreads = 1;
  const void* md = g_evp_sha512 ? g_evp_sha512() : nullptr;
  auto work = [&](int64_t lo, int64_t hi) {
    if (md) {
      unsigned int sz = 64;
      for (int64_t i = lo; i < hi; i++) {
        g_evp_digest(msgs + offsets[i], offsets[i + 1] - offsets[i],
                     out + 64 * i, &sz, md, nullptr);
      }
    } else {
      for (int64_t i = lo; i < hi; i++) {
        sha512_one(msgs + offsets[i], offsets[i + 1] - offsets[i],
                   out + 64 * i);
      }
    }
  };
  if (nthreads == 1) {
    work(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; t++) {
    int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(work, lo, hi);
  }
  for (auto& t : ts) t.join();
}
}
