// Native host runtime for the proof-of-storage framework.
//
// TPU-native equivalent of the reference's Rust native layer (SURVEY.md
// §2.6): the device handles bulk field arithmetic and batched hashing;
// this library covers the host-side hot paths the reference implemented
// in Rust — Blake3 hashing of byte streams, ChaCha20 keystream expansion,
// Keccak-f[1600] for the STROBE transcript, and column-major strided file
// I/O (the .porenc layout, encoded_file_writer.rs:309-389).
//
// Build: g++ -O3 -march=native -shared -fPIC posnative.cc -o libposnative.so

#include <cstdint>
#include <cstring>
#include <cstdio>

#if defined(__unix__) || defined(__APPLE__)
#include <unistd.h>
#endif
#if defined(__linux__)
#include <sys/vfs.h>
#endif

extern "C" {

// ---------------------------------------------------------------------------
// Blake3 (portable implementation, default hash mode)
// ---------------------------------------------------------------------------

static const uint32_t B3_IV[8] = {
    0x6A09E667u, 0xBB67AE85u, 0x3C6EF372u, 0xA54FF53Au,
    0x510E527Fu, 0x9B05688Cu, 0x1F83D9ABu, 0x5BE0CD19u,
};
static const uint8_t B3_PERM[16] = {2, 6, 3, 10, 7, 0, 4, 13,
                                    1, 11, 12, 5, 9, 14, 15, 8};
enum { CHUNK_START = 1, CHUNK_END = 2, PARENT = 4, ROOT = 8 };

static inline uint32_t rotr32(uint32_t x, int n) {
  return (x >> n) | (x << (32 - n));
}

static void b3_compress(const uint32_t cv[8], const uint32_t block[16],
                        uint64_t counter, uint32_t block_len, uint32_t flags,
                        uint32_t out[16]) {
  uint32_t v[16];
  uint32_t m[16];
  for (int i = 0; i < 8; i++) v[i] = cv[i];
  for (int i = 0; i < 4; i++) v[8 + i] = B3_IV[i];
  v[12] = (uint32_t)counter;
  v[13] = (uint32_t)(counter >> 32);
  v[14] = block_len;
  v[15] = flags;
  for (int i = 0; i < 16; i++) m[i] = block[i];

#define G(a, b, c, d, mx, my)                      \
  v[a] = v[a] + v[b] + (mx);                       \
  v[d] = rotr32(v[d] ^ v[a], 16);                  \
  v[c] = v[c] + v[d];                              \
  v[b] = rotr32(v[b] ^ v[c], 12);                  \
  v[a] = v[a] + v[b] + (my);                       \
  v[d] = rotr32(v[d] ^ v[a], 8);                   \
  v[c] = v[c] + v[d];                              \
  v[b] = rotr32(v[b] ^ v[c], 7);

  for (int r = 0; r < 7; r++) {
    G(0, 4, 8, 12, m[0], m[1]);
    G(1, 5, 9, 13, m[2], m[3]);
    G(2, 6, 10, 14, m[4], m[5]);
    G(3, 7, 11, 15, m[6], m[7]);
    G(0, 5, 10, 15, m[8], m[9]);
    G(1, 6, 11, 12, m[10], m[11]);
    G(2, 7, 8, 13, m[12], m[13]);
    G(3, 4, 9, 14, m[14], m[15]);
    if (r < 6) {
      uint32_t t[16];
      for (int i = 0; i < 16; i++) t[i] = m[B3_PERM[i]];
      memcpy(m, t, sizeof(t));
    }
  }
#undef G
  for (int i = 0; i < 8; i++) {
    out[i] = v[i] ^ v[i + 8];
    out[i + 8] = v[i + 8] ^ cv[i];
  }
}

static void b3_load_block(const uint8_t* p, size_t len, uint32_t block[16]) {
  uint8_t tmp[64];
  memset(tmp, 0, 64);
  memcpy(tmp, p, len);
  for (int i = 0; i < 16; i++) {
    block[i] = (uint32_t)tmp[4 * i] | ((uint32_t)tmp[4 * i + 1] << 8) |
               ((uint32_t)tmp[4 * i + 2] << 16) |
               ((uint32_t)tmp[4 * i + 3] << 24);
  }
}

// CV of one chunk (<= 1024 bytes); root flag applied if is_root.
static void b3_chunk_cv(const uint8_t* data, size_t len, uint64_t counter,
                        int is_root, uint32_t cv_out[8]) {
  uint32_t cv[8];
  memcpy(cv, B3_IV, sizeof(cv));
  size_t nblocks = len == 0 ? 1 : (len + 63) / 64;
  for (size_t b = 0; b < nblocks; b++) {
    size_t blen = len == 0 ? 0 : (b == nblocks - 1 ? len - 64 * b : 64);
    uint32_t flags = 0;
    if (b == 0) flags |= CHUNK_START;
    if (b == nblocks - 1) {
      flags |= CHUNK_END;
      if (is_root) flags |= ROOT;
    }
    uint32_t block[16], out[16];
    b3_load_block(data + 64 * b, blen, block);
    b3_compress(cv, block, counter, (uint32_t)blen, flags, out);
    memcpy(cv, out, 32);
  }
  memcpy(cv_out, cv, 32);
}

static void b3_parent(const uint32_t l[8], const uint32_t r[8], int is_root,
                      uint32_t out_cv[8]) {
  uint32_t block[16], out[16];
  memcpy(block, l, 32);
  memcpy(block + 8, r, 32);
  b3_compress(B3_IV, block, 0, 64, PARENT | (is_root ? ROOT : 0), out);
  memcpy(out_cv, out, 32);
}

void pos_blake3(const uint8_t* data, size_t len, uint8_t out[32]) {
  // incremental pairwise-with-carry merge (== left-leaning chunk tree)
  uint32_t stack[64][8];
  int depth = 0;
  size_t nchunks = len <= 1024 ? 1 : (len + 1023) / 1024;
  if (nchunks == 1) {
    uint32_t cv[8];
    b3_chunk_cv(data, len, 0, 1, cv);
    memcpy(out, cv, 32);
    return;
  }
  for (size_t c = 0; c < nchunks; c++) {
    size_t clen = c == nchunks - 1 ? len - 1024 * c : 1024;
    uint32_t cv[8];
    b3_chunk_cv(data + 1024 * c, clen, c, 0, cv);
    memcpy(stack[depth++], cv, 32);
    size_t total = c + 1;
    // the final chunk never merges eagerly (it carries the ROOT merge)
    if (c == nchunks - 1) break;
    while ((total & 1) == 0) {
      b3_parent(stack[depth - 2], stack[depth - 1], 0, stack[depth - 2]);
      depth--;
      total >>= 1;
    }
  }
  while (depth > 1) {
    b3_parent(stack[depth - 2], stack[depth - 1], depth == 2, stack[depth - 2]);
    depth--;
  }
  memcpy(out, stack[0], 32);
}

// Hash n_msgs equal-length messages laid out contiguously.
void pos_blake3_many(const uint8_t* data, size_t n_msgs, size_t msg_len,
                     uint8_t* out) {
  for (size_t i = 0; i < n_msgs; i++) {
    pos_blake3(data + i * msg_len, msg_len, out + 32 * i);
  }
}

// Merkle path folds, leaf -> root, for k columns at once (the verifier's
// ColumnPath check, lcpc-2d/src/lib.rs:1010-1030): h = H(h||sib) or
// H(sib||h) by the column index bit at each level.  Each 64-byte parent
// message is a single Blake3 chunk, so fold entirely in C — one call
// replaces the per-level python staging (~39-77 ms for a Brakedown 2^25
// proof's 6593 x 13 fold).
// leaves: (k, 32); sibs: (k, depth, 32); cols: (k,) i64; out: (k, 32).
void pos_fold_paths(const uint8_t* leaves, const uint8_t* sibs,
                    const int64_t* cols, int64_t k, int64_t depth,
                    uint8_t* out) {
#pragma omp parallel for schedule(static) if (k > 64)
  for (int64_t i = 0; i < k; i++) {
    uint8_t msg[64];
    uint8_t h[32];
    memcpy(h, leaves + 32 * i, 32);
    int64_t c = cols[i];
    for (int64_t l = 0; l < depth; l++) {
      const uint8_t* sib = sibs + (i * depth + l) * 32;
      if ((c & 1) == 0) {
        memcpy(msg, h, 32);
        memcpy(msg + 32, sib, 32);
      } else {
        memcpy(msg, sib, 32);
        memcpy(msg + 32, h, 32);
      }
      uint32_t cv[8];
      b3_chunk_cv(msg, 64, 0, 1, cv);
      memcpy(h, cv, 32);
      c >>= 1;
    }
    memcpy(out + 32 * i, h, 32);
  }
}

// ---------------------------------------------------------------------------
// BLAKE2b-256 (RFC 7693) — the reference's alternate digest type parameter
// (LcCommit<Blake2b, E>; doc/benchmark-results/sdig-ligero-isz-
// microbenchmarks ran commit_Ft255_Blake2b_16).  Batch form feeds the
// generic-digest commit path (crypto/digest.py hash_many).
// ---------------------------------------------------------------------------

static const uint64_t B2B_IV[8] = {
    0x6A09E667F3BCC908ull, 0xBB67AE8584CAA73Bull, 0x3C6EF372FE94F82Bull,
    0xA54FF53A5F1D36F1ull, 0x510E527FADE682D1ull, 0x9B05688C2B3E6C1Full,
    0x1F83D9ABFB41BD6Bull, 0x5BE0CD19137E2179ull};

static const uint8_t B2B_SIGMA[12][16] = {
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3},
    {11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4},
    {7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8},
    {9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13},
    {2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9},
    {12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11},
    {13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10},
    {6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5},
    {10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0},
    {0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15},
    {14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3}};

static inline uint64_t b2b_rotr(uint64_t x, int n) {
  return (x >> n) | (x << (64 - n));
}

static void b2b_compress(uint64_t h[8], const uint8_t* block, uint64_t t,
                         int last) {
  uint64_t m[16], v[16];
  memcpy(m, block, 128);
  for (int i = 0; i < 8; i++) v[i] = h[i];
  for (int i = 0; i < 8; i++) v[8 + i] = B2B_IV[i];
  v[12] ^= t;            // low counter word (messages < 2^64 bytes)
  if (last) v[14] = ~v[14];
  for (int r = 0; r < 12; r++) {
    const uint8_t* s = B2B_SIGMA[r];
#define B2B_G(a, b, c, d, x, y)                        \
  v[a] = v[a] + v[b] + (x); v[d] = b2b_rotr(v[d] ^ v[a], 32); \
  v[c] = v[c] + v[d];       v[b] = b2b_rotr(v[b] ^ v[c], 24); \
  v[a] = v[a] + v[b] + (y); v[d] = b2b_rotr(v[d] ^ v[a], 16); \
  v[c] = v[c] + v[d];       v[b] = b2b_rotr(v[b] ^ v[c], 63);
    B2B_G(0, 4, 8, 12, m[s[0]], m[s[1]])
    B2B_G(1, 5, 9, 13, m[s[2]], m[s[3]])
    B2B_G(2, 6, 10, 14, m[s[4]], m[s[5]])
    B2B_G(3, 7, 11, 15, m[s[6]], m[s[7]])
    B2B_G(0, 5, 10, 15, m[s[8]], m[s[9]])
    B2B_G(1, 6, 11, 12, m[s[10]], m[s[11]])
    B2B_G(2, 7, 8, 13, m[s[12]], m[s[13]])
    B2B_G(3, 4, 9, 14, m[s[14]], m[s[15]])
#undef B2B_G
  }
  for (int i = 0; i < 8; i++) h[i] ^= v[i] ^ v[8 + i];
}

// BLAKE2b with 32-byte output, no key (== hashlib.blake2b(digest_size=32)).
void pos_blake2b_256(const uint8_t* data, size_t len, uint8_t out[32]) {
  uint64_t h[8];
  for (int i = 0; i < 8; i++) h[i] = B2B_IV[i];
  h[0] ^= 0x01010000ull ^ 32;          // param block: digest_len=32, fanout=depth=1
  size_t off = 0;
  while (len - off > 128) {
    b2b_compress(h, data + off, (uint64_t)(off + 128), 0);
    off += 128;
  }
  uint8_t last[128];
  size_t rem = len - off;              // 0 < rem <= 128 unless len == 0
  memset(last, 0, 128);
  if (len) memcpy(last, data + off, rem);
  b2b_compress(h, last, (uint64_t)len, 1);
  memcpy(out, h, 32);
}

void pos_blake2b_many(const uint8_t* data, size_t n_msgs, size_t msg_len,
                      uint8_t* out) {
#pragma omp parallel for schedule(static) if (n_msgs > 16)
  for (size_t i = 0; i < n_msgs; i++) {
    pos_blake2b_256(data + i * msg_len, msg_len, out + 32 * i);
  }
}

// Hash messages with a 32-byte zero prefix (the column-leaf convention).
void pos_blake3_columns(const uint8_t* data, size_t n_cols, size_t col_len,
                        uint8_t* out) {
  // prefix shifts chunk boundaries; simplest correct approach: copy
  static thread_local uint8_t* buf = nullptr;
  static thread_local size_t buf_len = 0;
  size_t need = col_len + 32;
  if (buf_len < need) {
    delete[] buf;
    buf = new uint8_t[need];
    buf_len = need;
  }
  memset(buf, 0, 32);
  for (size_t i = 0; i < n_cols; i++) {
    memcpy(buf + 32, data + i * col_len, col_len);
    pos_blake3(buf, need, out + 32 * i);
  }
}

// ---------------------------------------------------------------------------
// Incremental multi-column Blake3 (the streaming storage accumulator)
// ---------------------------------------------------------------------------
//
// Hashes N equal-length column byte streams simultaneously; each stream is
// prefixed with the 32-byte zero block (the column-leaf convention).
// Chunk-CV stacks use the pairwise-with-carry merge (== left-leaning tree).

struct ColState {
  uint8_t buf[1024];
  uint32_t stack[54][8];
  int depth;
  int buf_len;
  uint64_t chunk_counter;
};

struct PosColumnHasher {
  size_t n_cols;
  ColState* cols;
};

extern "C" PosColumnHasher* pos_colhash_new(size_t n_cols) {
  PosColumnHasher* h = new PosColumnHasher;
  h->n_cols = n_cols;
  h->cols = new ColState[n_cols];
  for (size_t i = 0; i < n_cols; i++) {
    memset(h->cols[i].buf, 0, 32);      // zero-block prefix
    h->cols[i].buf_len = 32;
    h->cols[i].depth = 0;
    h->cols[i].chunk_counter = 0;
  }
  return h;
}

static void colhash_absorb_chunk(ColState* c) {
  // flush the buffered FULL chunk as a non-final chunk
  uint32_t cv[8];
  b3_chunk_cv(c->buf, 1024, c->chunk_counter, 0, cv);
  c->chunk_counter++;
  memcpy(c->stack[c->depth++], cv, 32);
  uint64_t total = c->chunk_counter;
  while ((total & 1) == 0 && c->depth >= 2) {
    b3_parent(c->stack[c->depth - 2], c->stack[c->depth - 1], 0,
              c->stack[c->depth - 2]);
    c->depth--;
    total >>= 1;
  }
  c->buf_len = 0;
}

static void colhash_update_one(ColState* c, const uint8_t* src, size_t k) {
  size_t pos = 0;
  while (pos < k) {
    if (c->buf_len == 1024) colhash_absorb_chunk(c);
    size_t take = 1024 - c->buf_len;
    if (take > k - pos) take = k - pos;
    memcpy(c->buf + c->buf_len, src + pos, take);
    c->buf_len += (int)take;
    pos += take;
  }
}

// data: (n_cols, k) row-major — k more bytes for every column.
extern "C" void pos_colhash_update(PosColumnHasher* h, const uint8_t* data,
                                   size_t k) {
#pragma omp parallel for schedule(static)
  for (size_t i = 0; i < h->n_cols; i++)
    colhash_update_one(&h->cols[i], data + i * k, k);
}

extern "C" void pos_colhash_finalize(PosColumnHasher* h, uint8_t* out) {
#pragma omp parallel for schedule(static)
  for (size_t i = 0; i < h->n_cols; i++) {
    ColState* c = &h->cols[i];
    uint32_t cv[8];
    int single = c->chunk_counter == 0;
    b3_chunk_cv(c->buf, c->buf_len, c->chunk_counter, single, cv);
    if (!single) {
      // merge stack right-to-left; ROOT on the last merge
      int d = c->depth;
      while (d > 0) {
        b3_parent(c->stack[d - 1], cv, d == 1, cv);
        d--;
      }
    }
    memcpy(out + 32 * i, cv, 32);
  }
}

extern "C" void pos_colhash_free(PosColumnHasher* h) {
  delete[] h->cols;
  delete h;
}

// -- chunk-CV cache primitives (incremental edit/append re-hash) ------------
// The column hash stream is 32 zero bytes ++ the column's encoded bytes;
// caching the CV of every FULL 1024-byte chunk lets an edit recompute only
// the chunks its rows touch and an append extend from the cached state,
// instead of re-hashing the whole file (reference rebuilds the full tree
// per edit: proof-of-storage/src/lcpc_online/file_handler.rs:331,474-481).

// CVs of full chunks [chunk0, chunk0+n_chunks) for all columns.
// data: (n_cols, n_chunks*1024) row-major — each row holds that column's
// stream bytes [chunk0*1024, (chunk0+n_chunks)*1024).
void pos_colhash_chunk_cvs(const uint8_t* data, int64_t n_cols,
                           int64_t chunk0, int64_t n_chunks,
                           uint32_t* cvs_out /* (n_cols, n_chunks, 8) */) {
#pragma omp parallel for schedule(static) if (n_cols * n_chunks > 64)
  for (int64_t c = 0; c < n_cols; c++) {
    const uint8_t* w = data + c * n_chunks * 1024;
    for (int64_t k = 0; k < n_chunks; k++)
      b3_chunk_cv(w + k * 1024, 1024, (uint64_t)(chunk0 + k), 0,
                  cvs_out + (c * n_chunks + k) * 8);
  }
}

// Column digests from cached full-chunk CVs plus the tail (final, possibly
// partial chunk).  Replays the accumulator's stack merge per column.
// cvs: (n_cols, n_full, 8); tail: (n_cols, tail_len) stream bytes after the
// last full chunk (tail_len in [0, 1024]); out: (n_cols, 32) digest bytes.
void pos_colhash_digests_from_cvs(const uint32_t* cvs, int64_t n_cols,
                                  int64_t n_full, const uint8_t* tail,
                                  int64_t tail_len, uint8_t* out) {
#pragma omp parallel for schedule(static) if (n_cols > 32)
  for (int64_t c = 0; c < n_cols; c++) {
    uint32_t stack[64][8];
    int depth = 0;
    for (int64_t k = 0; k < n_full; k++) {
      memcpy(stack[depth++], cvs + (c * n_full + k) * 8, 32);
      uint64_t total = (uint64_t)k + 1;
      while ((total & 1) == 0 && depth >= 2) {
        b3_parent(stack[depth - 2], stack[depth - 1], 0, stack[depth - 2]);
        depth--;
        total >>= 1;
      }
    }
    uint32_t cv[8];
    int single = n_full == 0;
    b3_chunk_cv(tail + c * tail_len, (size_t)tail_len, (uint64_t)n_full,
                single, cv);
    int d = depth;
    while (d > 0) {
      b3_parent(stack[d - 1], cv, d == 1, cv);
      d--;
    }
    memcpy(out + c * 32, cv, 32);
  }
}

// ---------------------------------------------------------------------------
// ChaCha (rand_chacha layout: 64-bit counter words 12-13, stream words 14-15)
// ---------------------------------------------------------------------------

void pos_chacha_blocks(const uint8_t key[32], uint64_t stream,
                       uint64_t counter0, size_t nblocks, int rounds,
                       uint8_t* out) {
  static const uint32_t C[4] = {0x61707865u, 0x3320646Eu, 0x79622D32u,
                                0x6B206574u};
  uint32_t k[8];
  for (int i = 0; i < 8; i++) {
    k[i] = (uint32_t)key[4 * i] | ((uint32_t)key[4 * i + 1] << 8) |
           ((uint32_t)key[4 * i + 2] << 16) | ((uint32_t)key[4 * i + 3] << 24);
  }
#pragma omp parallel for schedule(static) if (nblocks > 4096)
  for (size_t b = 0; b < nblocks; b++) {
    uint64_t ctr = counter0 + b;
    uint32_t s[16];
    for (int i = 0; i < 4; i++) s[i] = C[i];
    for (int i = 0; i < 8; i++) s[4 + i] = k[i];
    s[12] = (uint32_t)ctr;
    s[13] = (uint32_t)(ctr >> 32);
    s[14] = (uint32_t)stream;
    s[15] = (uint32_t)(stream >> 32);
    uint32_t x[16];
    memcpy(x, s, sizeof(s));
#define QR(a, b, c, d)                    \
  x[a] += x[b]; x[d] = rotr32(x[d] ^ x[a], 16); \
  x[c] += x[d]; x[b] = rotr32(x[b] ^ x[c], 20); \
  x[a] += x[b]; x[d] = rotr32(x[d] ^ x[a], 24); \
  x[c] += x[d]; x[b] = rotr32(x[b] ^ x[c], 25);
    for (int r = 0; r < rounds; r += 2) {
      QR(0, 4, 8, 12) QR(1, 5, 9, 13) QR(2, 6, 10, 14) QR(3, 7, 11, 15)
      QR(0, 5, 10, 15) QR(1, 6, 11, 12) QR(2, 7, 8, 13) QR(3, 4, 9, 14)
    }
#undef QR
    uint8_t* o = out + 64 * b;
    for (int i = 0; i < 16; i++) {
      uint32_t w = x[i] + s[i];
      o[4 * i] = (uint8_t)w;
      o[4 * i + 1] = (uint8_t)(w >> 8);
      o[4 * i + 2] = (uint8_t)(w >> 16);
      o[4 * i + 3] = (uint8_t)(w >> 24);
    }
  }
}

// ---------------------------------------------------------------------------
// Keccak-f[1600]
// ---------------------------------------------------------------------------

static const int KECCAK_RHO[25] = {0,  1,  62, 28, 27, 36, 44, 6,  55,
                                   20, 3,  10, 43, 25, 39, 41, 45, 15,
                                   21, 8,  18, 2,  61, 56, 14};
static inline uint64_t rotl64(uint64_t v, int n) {
  return n == 0 ? v : (v << n) | (v >> (64 - n));
}

void pos_keccak_f1600(uint64_t a[25]) {
  // generate round constants with the spec LFSR
  uint64_t rc_lfsr = 1;
  for (int rnd = 0; rnd < 24; rnd++) {
    uint64_t c[5], d[5], b[25];
    for (int x = 0; x < 5; x++)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; x++)
      d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++) a[x + 5 * y] ^= d[x];
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl64(a[x + 5 * y], KECCAK_RHO[x + 5 * y]);
    for (int x = 0; x < 5; x++)
      for (int y = 0; y < 5; y++)
        a[x + 5 * y] = b[x + 5 * y] ^ (~b[(x + 1) % 5 + 5 * y] & b[(x + 2) % 5 + 5 * y]);
    // iota via LFSR
    uint64_t rc = 0;
    for (int j = 0; j < 7; j++) {
      // bit = lfsr output
      uint64_t bit = rc_lfsr & 1;
      rc |= bit << ((1u << j) - 1);
      rc_lfsr <<= 1;
      if (rc_lfsr & 0x100) rc_lfsr ^= 0x171;
    }
    a[0] ^= rc;
  }
}

// ---------------------------------------------------------------------------
// STROBE-128 duplex (merlin transcript fast path)
// ---------------------------------------------------------------------------
//
// Mirrors crypto/strobe.py (merlin-2.0/src/strobe.rs semantics): the state
// layout, begin-op framing, and the state_bytes() snapshot must stay
// bit-identical with the pure-python implementation (test oracle).

enum {
  STROBE_R = 166,
  SF_I = 1, SF_A = 2, SF_C = 4, SF_T = 8, SF_M = 16, SF_K = 32,
};

struct PosStrobe {
  alignas(8) uint8_t state[200];
  uint8_t pos, pos_begin, cur_flags;
};

static void strobe_run_f(PosStrobe* s) {
  s->state[s->pos] ^= s->pos_begin;
  s->state[s->pos + 1] ^= 0x04;
  s->state[STROBE_R + 1] ^= 0x80;
  pos_keccak_f1600((uint64_t*)s->state);
  s->pos = 0;
  s->pos_begin = 0;
}

static void strobe_absorb(PosStrobe* s, const uint8_t* d, size_t n) {
  for (size_t i = 0; i < n; i++) {
    s->state[s->pos++] ^= d[i];
    if (s->pos == STROBE_R) strobe_run_f(s);
  }
}

static void strobe_squeeze(PosStrobe* s, uint8_t* o, size_t n) {
  for (size_t i = 0; i < n; i++) {
    o[i] = s->state[s->pos];
    s->state[s->pos++] = 0;
    if (s->pos == STROBE_R) strobe_run_f(s);
  }
}

static void strobe_begin_op(PosStrobe* s, uint8_t flags) {
  uint8_t hdr[2] = {s->pos_begin, flags};
  s->pos_begin = s->pos + 1;
  s->cur_flags = flags;
  strobe_absorb(s, hdr, 2);
  if ((flags & (SF_C | SF_K)) && s->pos != 0) strobe_run_f(s);
}

PosStrobe* pos_strobe_new(const uint8_t* label, size_t label_len) {
  PosStrobe* s = new PosStrobe;
  memset(s->state, 0, 200);
  const uint8_t init[6] = {1, STROBE_R + 2, 1, 0, 1, 96};
  memcpy(s->state, init, 6);
  memcpy(s->state + 6, "STROBEv1.0.2", 12);
  pos_keccak_f1600((uint64_t*)s->state);
  s->pos = 0;
  s->pos_begin = 0;
  s->cur_flags = 0;
  strobe_begin_op(s, SF_M | SF_A);   // meta_ad(label, more=false)
  strobe_absorb(s, label, label_len);
  return s;
}

void pos_strobe_meta_ad(PosStrobe* s, const uint8_t* d, size_t n, int more) {
  if (!more) strobe_begin_op(s, SF_M | SF_A);
  strobe_absorb(s, d, n);
}

void pos_strobe_ad(PosStrobe* s, const uint8_t* d, size_t n, int more) {
  if (!more) strobe_begin_op(s, SF_A);
  strobe_absorb(s, d, n);
}

void pos_strobe_prf(PosStrobe* s, uint8_t* out, size_t n, int more) {
  if (!more) strobe_begin_op(s, SF_I | SF_A | SF_C);
  strobe_squeeze(s, out, n);
}

// merlin append_message(label, msg), `count` times over equal-length
// messages laid out contiguously: meta_ad(label) / meta_ad(len_le32, more)
// / ad(msg) per message.  One native call replaces 3*count python STROBE
// ops (the transcript cost of appending a collapsed row's coefficients).
void pos_strobe_append_batch(PosStrobe* s, const uint8_t* label,
                             size_t label_len, const uint8_t* msgs,
                             size_t msg_len, size_t count) {
  uint8_t len_le[4] = {
      (uint8_t)msg_len, (uint8_t)(msg_len >> 8),
      (uint8_t)(msg_len >> 16), (uint8_t)(msg_len >> 24)};
  for (size_t i = 0; i < count; i++) {
    strobe_begin_op(s, SF_M | SF_A);
    strobe_absorb(s, label, label_len);
    strobe_absorb(s, len_le, 4);
    strobe_begin_op(s, SF_A);
    strobe_absorb(s, msgs + i * msg_len, msg_len);
  }
}

PosStrobe* pos_strobe_clone(const PosStrobe* s) {
  PosStrobe* n = new PosStrobe;
  memcpy(n, s, sizeof(PosStrobe));
  return n;
}

// 203-byte snapshot: state || pos || pos_begin || cur_flags (test oracle).
void pos_strobe_state(const PosStrobe* s, uint8_t* out) {
  memcpy(out, s->state, 200);
  out[200] = s->pos;
  out[201] = s->pos_begin;
  out[202] = s->cur_flags;
}

void pos_strobe_free(PosStrobe* s) { delete s; }

// ---------------------------------------------------------------------------
// Column-major strided file I/O (.porenc layout)
// ---------------------------------------------------------------------------

#if defined(__unix__) || defined(__APPLE__)

// Read `count` elements of `elem_size` bytes starting at byte `start`,
// advancing `stride` bytes between elements (one element per column).
int pos_pread_strided(int fd, uint8_t* buf, uint64_t start, uint64_t stride,
                      uint64_t elem_size, uint64_t count) {
  for (uint64_t i = 0; i < count; i++) {
    ssize_t got = pread(fd, buf + i * elem_size, elem_size,
                        (off_t)(start + i * stride));
    if (got != (ssize_t)elem_size) return -1;
  }
  return 0;
}

int pos_pwrite_strided(int fd, const uint8_t* buf, uint64_t start,
                       uint64_t stride, uint64_t elem_size, uint64_t count) {
  for (uint64_t i = 0; i < count; i++) {
    ssize_t put = pwrite(fd, buf + i * elem_size, elem_size,
                         (off_t)(start + i * stride));
    if (put != (ssize_t)elem_size) return -1;
  }
  return 0;
}

// Batched: for each of `count` strided positions read `block` bytes
// (a run of consecutive rows within each column).
int pos_pread_strided_blocks(int fd, uint8_t* buf, uint64_t start,
                             uint64_t stride, uint64_t block, uint64_t count) {
  for (uint64_t i = 0; i < count; i++) {
    ssize_t got = pread(fd, buf + i * block, block, (off_t)(start + i * stride));
    if (got != (ssize_t)block) return -1;
  }
  return 0;
}

int pos_pwrite_strided_blocks(int fd, const uint8_t* buf, uint64_t start,
                              uint64_t stride, uint64_t block, uint64_t count) {
  for (uint64_t i = 0; i < count; i++) {
    ssize_t put = pwrite(fd, buf + i * block, block, (off_t)(start + i * stride));
    if (put != (ssize_t)block) return -1;
  }
  return 0;
}

#endif  // unix

// Is fd on a memory-backed filesystem (tmpfs/ramfs)?  The writer fallocates
// on block filesystems (mmap stores into unwritten-extent space beat ext4
// delayed allocation ~5x) but must NOT on tmpfs, where fallocated-but-
// unmapped pages take a ~10x slower fault path than plain sparse faults.
int pos_fd_is_memfs(int fd) {
#if defined(__linux__)
  struct statfs s;
  if (fstatfs(fd, &s) != 0) return 0;
  return (s.f_type == 0x01021994 /* TMPFS */ ||
          s.f_type == 0x858458f6 /* RAMFS */) ? 1 : 0;
#else
  (void)fd;
  return 0;
#endif
}

// ---------------------------------------------------------------------------
// Single-word field NTT (host streaming-encode path)
// ---------------------------------------------------------------------------
// The PoS streaming writer (encoded_file_writer.rs:309-389) must sustain
// >= 100 MB/s on a plain host where the device path would round-trip
// through a slow interconnect.  For one-u64 fields (ft63 / writeable_ft63,
// p < 2^63) the whole encode runs natively: Shoup single-word modmul, the
// same classical DIT butterflies as ops/ntt.py (bit-reversed load, natural
// output order), zero-padding-aware stage pruning, OpenMP across rows.
// Outputs are canonical residues, hence bit-identical to the device NTT.

static inline uint64_t mulmod_u64(uint64_t a, uint64_t b, uint64_t p) {
  return (uint64_t)(((unsigned __int128)a * b) % p);
}

static uint64_t powmod_u64(uint64_t a, uint64_t e, uint64_t p) {
  uint64_t r = 1 % p;
  while (e) {
    if (e & 1) r = mulmod_u64(r, a, p);
    a = mulmod_u64(a, a, p);
    e >>= 1;
  }
  return r;
}

// Shoup multiply-by-constant: wsh = floor(w * 2^64 / p); needs p < 2^63.
static inline uint64_t shoup_mul(uint64_t a, uint64_t w, uint64_t wsh,
                                 uint64_t p) {
  uint64_t q = (uint64_t)(((unsigned __int128)a * wsh) >> 64);
  uint64_t r = a * w - q * p;  // in [0, 2p)
  return r >= p ? r - p : r;
}

// Twiddle tables in the classic "size-n" layout: tw[half + j] = wm^j for
// wm = w^(n/(2*half)), j in [0, half).  tsh holds the Shoup companions.
static void ntt_build_tables(uint64_t w, uint64_t p, int64_t n,
                             uint64_t* tw, uint64_t* tsh) {
  tw[0] = 1;
  for (int64_t half = 1; half < n; half <<= 1) {
    uint64_t wm = powmod_u64(w, (uint64_t)(n / (2 * half)), p);
    uint64_t v = 1;
    for (int64_t j = 0; j < half; j++) {
      tw[half + j] = v;
      v = mulmod_u64(v, wm, p);
    }
  }
  for (int64_t i = 0; i < n; i++)
    tsh[i] = (uint64_t)((((unsigned __int128)tw[i]) << 64) / p);
}

// Shared butterfly stage driver: in-place stages [skip, logn) on one row.
static void ntt_run_stages(uint64_t* x, int64_t n, int logn, int skip,
                           const uint64_t* tw, const uint64_t* tsh,
                           uint64_t p) {
  int s = skip;
  if (((logn - skip) & 1) != 0) {
    // odd stage count: one radix-2 pass, then merged pairs the rest
    int64_t half = (int64_t)1 << s;
    for (int64_t j0 = 0; j0 < n; j0 += 2 * half) {
      for (int64_t j = 0; j < half; j++) {
        uint64_t u = x[j0 + j];
        uint64_t v = shoup_mul(x[j0 + j + half], tw[half + j],
                               tsh[half + j], p);
        uint64_t a = u + v;
        x[j0 + j] = a >= p ? a - p : a;
        x[j0 + j + half] = u >= v ? u - v : u - v + p;
      }
    }
    s++;
  }
  // merged stage pairs: one pass of 4-point butterflies does stages
  // (s, s+1) -- half the row traffic and 3/4 the twiddle loads of two
  // radix-2 passes (muls are unchanged; the pass is memory-bound)
  for (; s + 1 < logn; s += 2) {
    int64_t h = (int64_t)1 << s;
    const uint64_t* t1w = tw + h;
    const uint64_t* t1s = tsh + h;
    const uint64_t* t2w = tw + 2 * h;
    const uint64_t* t2s = tsh + 2 * h;
    for (int64_t i0 = 0; i0 < n; i0 += 4 * h) {
      uint64_t* xa = x + i0;
      for (int64_t j = 0; j < h; j++) {
        uint64_t a = xa[j], b = xa[j + h], c = xa[j + 2 * h],
                 d = xa[j + 3 * h];
        uint64_t bb = shoup_mul(b, t1w[j], t1s[j], p);
        uint64_t dd = shoup_mul(d, t1w[j], t1s[j], p);
        uint64_t a1 = a + bb;
        a1 = a1 >= p ? a1 - p : a1;
        uint64_t b1 = a >= bb ? a - bb : a - bb + p;
        uint64_t c1 = c + dd;
        c1 = c1 >= p ? c1 - p : c1;
        uint64_t d1 = c >= dd ? c - dd : c - dd + p;
        uint64_t cc = shoup_mul(c1, t2w[j], t2s[j], p);
        uint64_t ee = shoup_mul(d1, t2w[j + h], t2s[j + h], p);
        uint64_t A = a1 + cc;
        xa[j] = A >= p ? A - p : A;
        uint64_t Bv = b1 + ee;
        xa[j + h] = Bv >= p ? Bv - p : Bv;
        xa[j + 2 * h] = a1 >= cc ? a1 - cc : a1 - cc + p;
        xa[j + 3 * h] = b1 >= ee ? b1 - ee : b1 - ee + p;
      }
    }
  }
}

// Batched forward NTT: in (k, n_in) coefficient rows -> out (k, n)
// evaluation rows (values < p; n a power of two; n_in <= n).  `w` must be
// a primitive n-th root of unity mod p (FieldSpec.nth_root_of_unity(n)).
int pos_ntt_rows_u64(const uint64_t* in, int64_t k, int64_t n_in,
                     uint64_t* out, int64_t n, uint64_t p, uint64_t w) {
  if (n < 2 || (n & (n - 1)) || n_in > n || n_in < 1 || p >> 63) return -1;
  int logn = 0;
  while ((int64_t)1 << logn < n) logn++;
  // zero-pad stage pruning (ops/ntt_pallas.py n_nonzero semantics): the
  // first `skip` stages only duplicate values, so load with
  // idx[j] = rev(j & ~(2^skip - 1)) and start at stage `skip`.
  int64_t np2 = 1;
  while (np2 < n_in) np2 <<= 1;
  int skip = 0;
  while ((np2 << (skip + 1)) <= n) skip++;
  uint64_t* tw = new uint64_t[n];
  uint64_t* tsh = new uint64_t[n];
  ntt_build_tables(w, p, n, tw, tsh);
  int32_t* idx = new int32_t[n];
  int64_t mask = ~(((int64_t)1 << skip) - 1);
  for (int64_t j = 0; j < n; j++) {
    int64_t jj = j & mask, r = 0;
    for (int b = 0; b < logn; b++) r |= ((jj >> b) & 1) << (logn - 1 - b);
    idx[j] = (int32_t)r;
  }
#pragma omp parallel for schedule(static)
  for (int64_t row = 0; row < k; row++) {
    const uint64_t* src = in + row * n_in;
    uint64_t* x = out + row * n;
    for (int64_t j = 0; j < n; j++) {
      int32_t s = idx[j];
      x[j] = s < n_in ? src[s] : 0;
    }
    ntt_run_stages(x, n, logn, skip, tw, tsh, p);
  }
  delete[] idx;
  delete[] tsh;
  delete[] tw;
  return 0;
}

// Forward NTT straight from raw data bytes: coefficient (r, j) is the
// little-endian value of data[(r*n_in+j)*cap : +cap] (zero past nbytes) —
// DataField::from_byte_vec semantics fused into the bit-reversed load, so
// the host streaming path never materializes a coefficient array.
int pos_ntt_rows_from_bytes_u64(const uint8_t* data, int64_t nbytes,
                                int64_t cap, int64_t k, int64_t n_in,
                                uint64_t* out, int64_t n, uint64_t p,
                                uint64_t w) {
  if (n < 2 || (n & (n - 1)) || n_in > n || n_in < 1 || p >> 63 ||
      cap < 1 || cap > 8)
    return -1;
  int logn = 0;
  while ((int64_t)1 << logn < n) logn++;
  int64_t np2 = 1;
  while (np2 < n_in) np2 <<= 1;
  int skip = 0;
  while ((np2 << (skip + 1)) <= n) skip++;
  uint64_t* tw = new uint64_t[n];
  uint64_t* tsh = new uint64_t[n];
  ntt_build_tables(w, p, n, tw, tsh);
  int32_t* idx = new int32_t[n];
  int64_t mask = ~(((int64_t)1 << skip) - 1);
  for (int64_t j = 0; j < n; j++) {
    int64_t jj = j & mask, r = 0;
    for (int b = 0; b < logn; b++) r |= ((jj >> b) & 1) << (logn - 1 - b);
    idx[j] = (int32_t)r;
  }
  uint64_t capmask = cap == 8 ? ~0ULL : ((1ULL << (8 * cap)) - 1);
#pragma omp parallel for schedule(static)
  for (int64_t row = 0; row < k; row++) {
    uint64_t* x = out + row * n;
    for (int64_t j = 0; j < n; j++) {
      int32_t s = idx[j];
      uint64_t v = 0;
      if (s < n_in) {
        int64_t off = (row * n_in + s) * cap;
        if (off + 8 <= nbytes) {
          memcpy(&v, data + off, 8);
          v &= capmask;
        } else if (off < nbytes) {
          int64_t take = nbytes - off;
          if (take > cap) take = cap;
          memcpy(&v, data + off, (size_t)take);
          v &= capmask;
        }
      }
      x[j] = v;
    }
    ntt_run_stages(x, n, logn, skip, tw, tsh, p);
  }
  delete[] idx;
  delete[] tsh;
  delete[] tw;
  return 0;
}

// Batched inverse NTT: in (k, n) evaluation rows -> out (k, n) coefficient
// rows.  w_inv must be the inverse primitive n-th root; n_inv = n^-1 mod p.
int pos_intt_rows_u64(const uint64_t* in, int64_t k, uint64_t* out,
                      int64_t n, uint64_t p, uint64_t w_inv,
                      uint64_t n_inv) {
  int rc = pos_ntt_rows_u64(in, k, n, out, n, p, w_inv);
  if (rc != 0) return rc;
  uint64_t nsh = (uint64_t)((((unsigned __int128)n_inv) << 64) / p);
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < k * n; i++)
    out[i] = shoup_mul(out[i], n_inv, nsh, p);
  return 0;
}

// One-pass scatter of a row-major (k, n) encoded batch into (a) the
// column-major mapped .porenc region at dst[c*stride + r] and (b) an
// optional contiguous (n, k) staging block for the column hasher.  Writing
// through a fallocate'd mmap turns the writer's 4096 scattered pwrites per
// batch (ext4 block-allocation storms) into page-cache memcpys.
void pos_scatter_u64(const uint64_t* src, int64_t k, int64_t n,
                     uint64_t* dst, int64_t stride, uint64_t* contig) {
  const int64_t B = 32;
#pragma omp parallel for schedule(static)
  for (int64_t j0 = 0; j0 < n; j0 += B) {
    int64_t j1 = j0 + B < n ? j0 + B : n;
    if (contig) {
      // transpose into the contiguous staging block first, then one
      // sequential memcpy per column into the mapped region (measured ~10x
      // faster than interleaving strided stores with the staging reads)
      for (int64_t i0 = 0; i0 < k; i0 += B) {
        int64_t i1 = i0 + B < k ? i0 + B : k;
        for (int64_t j = j0; j < j1; j++) {
          uint64_t* out = contig + j * k;
          for (int64_t i = i0; i < i1; i++) out[i] = src[i * n + j];
        }
      }
      for (int64_t j = j0; j < j1; j++)
        memcpy(dst + j * stride, contig + j * k, (size_t)k * 8);
    } else {
      for (int64_t i0 = 0; i0 < k; i0 += B) {
        int64_t i1 = i0 + B < k ? i0 + B : k;
        for (int64_t j = j0; j < j1; j++) {
          uint64_t* cold = dst + j * stride;
          for (int64_t i = i0; i < i1; i++) cold[i] = src[i * n + j];
        }
      }
    }
  }
}

// Fused scatter + column hash: transpose a row-major (k, n) encoded batch
// through a small per-thread staging buffer, then per column memcpy the
// contiguous run into the mapped .porenc region AND absorb it into that
// column's Blake3 state while it is still cache-hot.  One read of src, one
// write of dst, hash from L1 — no full-size staging array.
void pos_scatter_hash_u64(const uint64_t* src, int64_t k, int64_t n,
                          uint64_t* dst, int64_t stride,
                          PosColumnHasher* h) {
  const int64_t B = 32;
#pragma omp parallel
  {
    uint64_t* buf = new uint64_t[B * k];
#pragma omp for schedule(static)
    for (int64_t j0 = 0; j0 < n; j0 += B) {
      int64_t j1 = j0 + B < n ? j0 + B : n;
      for (int64_t i0 = 0; i0 < k; i0 += B) {
        int64_t i1 = i0 + B < k ? i0 + B : k;
        for (int64_t j = j0; j < j1; j++) {
          uint64_t* out = buf + (j - j0) * k;
          for (int64_t i = i0; i < i1; i++) out[i] = src[i * n + j];
        }
      }
      for (int64_t j = j0; j < j1; j++) {
        const uint64_t* col = buf + (j - j0) * k;
        memcpy(dst + j * stride, col, (size_t)k * 8);
        if (h) colhash_update_one(&h->cols[j], (const uint8_t*)col,
                                  (size_t)k * 8);
      }
    }
    delete[] buf;
  }
}

// Blocked (k, n) -> (n, k) u64 transpose (column-major staging for the
// strided .porenc writes and the per-column hash streams).
void pos_transpose_u64(const uint64_t* src, int64_t k, int64_t n,
                       uint64_t* dst) {
  const int64_t B = 32;
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t i0 = 0; i0 < k; i0 += B) {
    for (int64_t j0 = 0; j0 < n; j0 += B) {
      int64_t i1 = i0 + B < k ? i0 + B : k;
      int64_t j1 = j0 + B < n ? j0 + B : n;
      for (int64_t i = i0; i < i1; i++)
        for (int64_t j = j0; j < j1; j++)
          dst[j * k + i] = src[i * n + j];
    }
  }
}

// ---------------------------------------------------------------------------
// Brakedown matgen walk (matgen.rs:115-188 draw-by-draw semantics)
// ---------------------------------------------------------------------------
// Exact sequential walk over a peeked ChaCha u64 window.  Per column:
// uniform rejection draws (rand 0.8 widening multiply: accept when the low
// 64 bits of v*range <= zone) until d DISTINCT rows, then sort; then k-word
// field attempts (top word masked to the field's bit width, accept when the
// masked repr is in (0, p)) until d accepted.  Outputs the sorted rows and
// the accepted masked reprs (Montgomery form; the host converts repr*R^-1
// mod p vectorized).  Returns the number of u64 words consumed, or -1 when
// the window ran out (caller re-peeks a bigger window and retries).
int64_t pos_matgen_walk(const uint64_t* w, int64_t nwords,
                        int64_t n, int64_t d,
                        uint64_t range, uint64_t zone, uint64_t low,
                        int32_t k, uint64_t top_mask,
                        const uint64_t* p_words,
                        int64_t* rows_out,      // n*d
                        uint64_t* reprs_out) {  // n*d*k
  if (k < 1 || k > 8 || d < 1) return -2;
  int64_t i = 0;
  for (int64_t c = 0; c < n; c++) {
    int64_t* rows = rows_out + c * d;
    int64_t cnt = 0;
    while (cnt < d) {
      if (i >= nwords) return -1;
      uint64_t v = w[i++];
      unsigned __int128 m = (unsigned __int128)v * range;
      if ((uint64_t)m <= zone) {
        int64_t x = (int64_t)(low + (uint64_t)(m >> 64));
        bool dup = false;
        for (int64_t j = 0; j < cnt; j++)
          if (rows[j] == x) { dup = true; break; }
        if (!dup) rows[cnt++] = x;
      }
    }
    for (int64_t a = 1; a < d; a++) {  // insertion sort (d is small)
      int64_t key = rows[a];
      int64_t b = a - 1;
      while (b >= 0 && rows[b] > key) { rows[b + 1] = rows[b]; b--; }
      rows[b + 1] = key;
    }
    uint64_t* reprs = reprs_out + (uint64_t)(c * d) * k;
    int64_t got = 0;
    while (got < d) {
      if (i + k > nwords) return -1;
      uint64_t tmp[8];
      for (int32_t j = 0; j < k; j++) tmp[j] = w[i + j];
      i += k;
      tmp[k - 1] &= top_mask;
      int cmp = 0;
      for (int32_t j = k - 1; j >= 0; j--) {
        if (tmp[j] < p_words[j]) { cmp = -1; break; }
        if (tmp[j] > p_words[j]) { cmp = 1; break; }
      }
      bool nz = false;
      for (int32_t j = 0; j < k; j++)
        if (tmp[j]) { nz = true; break; }
      if (cmp < 0 && nz) {
        uint64_t* outp = reprs + got * k;
        for (int32_t j = 0; j < k; j++) outp[j] = tmp[j];
        got++;
      }
    }
  }
  return i;
}

// Montgomery REDC over M k-limb reprs: value = repr * R^-1 mod p with
// R = 2^(64k), pinv = -p^-1 mod 2^64; emits 16-bit limbs (uint32, L16 per
// value) directly — the framework's canonical host layout — skipping the
// u64 intermediate.  reprs are already < p (matgen's acceptance condition),
// so one final conditional subtract suffices.
void pos_mont_redc_limbs(const uint64_t* reprs, int64_t M, int32_t k,
                         const uint64_t* p_words, uint64_t pinv,
                         int32_t L16, uint32_t* limbs_out) {
  if (k < 1 || k > 8 || L16 < 1 || L16 > 4 * k) return;
#pragma omp parallel for schedule(static) if (M > 16384)
  for (int64_t r = 0; r < M; r++) {
    uint64_t T[17] = {0};
    const uint64_t* a = reprs + r * k;
    for (int32_t j = 0; j < k; j++) T[j] = a[j];
    for (int32_t i = 0; i < k; i++) {
      uint64_t m = T[i] * pinv;
      unsigned __int128 carry = 0;
      for (int32_t j = 0; j < k; j++) {
        unsigned __int128 s =
            (unsigned __int128)m * p_words[j] + T[i + j] + carry;
        T[i + j] = (uint64_t)s;
        carry = s >> 64;
      }
      int32_t t = i + k;
      while (carry) {
        unsigned __int128 s = (unsigned __int128)T[t] + carry;
        T[t] = (uint64_t)s;
        carry = s >> 64;
        t++;
      }
    }
    // result in T[k..2k); subtract p if >= p
    int cmp = 0;
    for (int32_t j = k - 1; j >= 0; j--) {
      if (T[k + j] < p_words[j]) { cmp = -1; break; }
      if (T[k + j] > p_words[j]) { cmp = 1; break; }
    }
    uint64_t v[8];
    if (cmp >= 0) {
      unsigned __int128 borrow = 0;
      for (int32_t j = 0; j < k; j++) {
        unsigned __int128 s = (unsigned __int128)T[k + j] - p_words[j] - borrow;
        v[j] = (uint64_t)s;
        borrow = (s >> 64) ? 1 : 0;
      }
    } else {
      for (int32_t j = 0; j < k; j++) v[j] = T[k + j];
    }
    uint32_t* o = limbs_out + r * L16;
    for (int32_t t = 0; t < L16; t++)
      o[t] = (uint32_t)((v[t >> 2] >> (16 * (t & 3))) & 0xFFFF);
  }
}

// ---------------------------------------------------------------------------
// Four-word (< 2^255) field NTT — Montgomery CIOS host path
// ---------------------------------------------------------------------------
// ft253_192 (the PoS 31-byte data field, ft253_192.rs) has no single-word
// representation, so the generic streaming writer previously encoded through
// the XLA limb NTT on the CPU backend at ~2.4 MB/s (measured, 4-core VM).
// This is the 4x64 analogue of the Shoup path above: values in the NORMAL
// domain as 4 LE u64 words, twiddles premultiplied into the Montgomery
// domain (w * 2^256 mod p, built host-side in Python bignums) so every
// butterfly multiply is one CIOS montmul that lands back in the normal
// domain.  Outputs are canonical residues — bit-identical to the device NTT.

static inline void add_mod_w4(const uint64_t* a, const uint64_t* b,
                              const uint64_t* p, uint64_t* o) {
  uint64_t s[4], d[4], carry = 0, borrow = 0;
  for (int i = 0; i < 4; i++) {
    unsigned __int128 x = (unsigned __int128)a[i] + b[i] + carry;
    s[i] = (uint64_t)x;
    carry = (uint64_t)(x >> 64);
  }
  for (int i = 0; i < 4; i++) {
    unsigned __int128 x =
        (unsigned __int128)s[i] - p[i] - borrow;
    d[i] = (uint64_t)x;
    borrow = (x >> 64) ? 1 : 0;
  }
  const uint64_t* src = (carry || !borrow) ? d : s;
  for (int i = 0; i < 4; i++) o[i] = src[i];
}

static inline void sub_mod_w4(const uint64_t* a, const uint64_t* b,
                              const uint64_t* p, uint64_t* o) {
  uint64_t d[4], borrow = 0;
  for (int i = 0; i < 4; i++) {
    unsigned __int128 x =
        (unsigned __int128)a[i] - b[i] - borrow;
    d[i] = (uint64_t)x;
    borrow = (x >> 64) ? 1 : 0;
  }
  if (borrow) {
    uint64_t carry = 0;
    for (int i = 0; i < 4; i++) {
      unsigned __int128 x = (unsigned __int128)d[i] + p[i] + carry;
      o[i] = (uint64_t)x;
      carry = (uint64_t)(x >> 64);
    }
  } else {
    for (int i = 0; i < 4; i++) o[i] = d[i];
  }
}

// CIOS Montgomery multiply (Koc et al.), N = 4: o = a * b * 2^-256 mod p.
// With b in the Montgomery domain (b = w * 2^256 mod p) this returns the
// normal-domain product a * w mod p.  n0inv = -p[0]^-1 mod 2^64.
static inline void mont_mul_w4(const uint64_t* a, const uint64_t* b,
                               const uint64_t* p, uint64_t n0inv,
                               uint64_t* o) {
  uint64_t t[6] = {0, 0, 0, 0, 0, 0};
  for (int i = 0; i < 4; i++) {
    uint64_t carry = 0;
    for (int j = 0; j < 4; j++) {
      unsigned __int128 x = (unsigned __int128)a[i] * b[j] + t[j] + carry;
      t[j] = (uint64_t)x;
      carry = (uint64_t)(x >> 64);
    }
    unsigned __int128 x = (unsigned __int128)t[4] + carry;
    t[4] = (uint64_t)x;
    t[5] = (uint64_t)(x >> 64);
    uint64_t m = t[0] * n0inv;
    x = (unsigned __int128)m * p[0] + t[0];
    carry = (uint64_t)(x >> 64);
    for (int j = 1; j < 4; j++) {
      x = (unsigned __int128)m * p[j] + t[j] + carry;
      t[j - 1] = (uint64_t)x;
      carry = (uint64_t)(x >> 64);
    }
    x = (unsigned __int128)t[4] + carry;
    t[3] = (uint64_t)x;
    t[4] = t[5] + (uint64_t)(x >> 64);
  }
  // t[0..3] (+ t[4] overflow bit) < 2p: one conditional subtract
  int ge = t[4] != 0;
  if (!ge) {
    ge = 1;
    for (int j = 3; j >= 0; j--) {
      if (t[j] < p[j]) { ge = 0; break; }
      if (t[j] > p[j]) break;
    }
  }
  if (ge) {
    uint64_t borrow = 0;
    for (int j = 0; j < 4; j++) {
      unsigned __int128 x =
          (unsigned __int128)t[j] - p[j] - borrow;
      o[j] = (uint64_t)x;
      borrow = (x >> 64) ? 1 : 0;
    }
  } else {
    for (int j = 0; j < 4; j++) o[j] = t[j];
  }
}

// Gentleman-Sande-free DIT stage loop for 4-word rows (shared by the
// limb-array and from-bytes entry points).
static void ntt_run_stages_w4(uint64_t* x, int64_t n, int logn, int skip,
                              const uint64_t* tw_mont, const uint64_t* p4,
                              uint64_t n0inv) {
  for (int st = skip; st < logn; st++) {
    int64_t half = (int64_t)1 << st;
    const uint64_t* tws = tw_mont + 4 * half;
    for (int64_t j0 = 0; j0 < n; j0 += 2 * half) {
      for (int64_t j = 0; j < half; j++) {
        uint64_t* xu = x + 4 * (j0 + j);
        uint64_t* xv = x + 4 * (j0 + j + half);
        uint64_t v[4];
        mont_mul_w4(xv, tws + 4 * j, p4, n0inv, v);
        uint64_t u[4] = {xu[0], xu[1], xu[2], xu[3]};
        add_mod_w4(u, v, p4, xu);
        sub_mod_w4(u, v, p4, xv);
      }
    }
  }
}

// Batched forward NTT over a 4-word field: in (k, n_in, 4) LE-word
// coefficient rows -> out (k, n, 4) evaluation rows.  tw_mont is the
// (n, 4) size-n-layout twiddle table ALREADY in the Montgomery domain
// (tw[half+j] = (w^(n/(2*half)))^j * 2^256 mod p), built by the Python
// caller with bignum arithmetic; n0inv = -p[0]^-1 mod 2^64.  Same
// zero-pad stage pruning + bit-reversed load as pos_ntt_rows_u64.
int pos_ntt_rows_w4(const uint64_t* in, int64_t k, int64_t n_in,
                    uint64_t* out, int64_t n, const uint64_t* p4,
                    uint64_t n0inv, const uint64_t* tw_mont) {
  if (n < 2 || (n & (n - 1)) || n_in > n || n_in < 1 || (p4[3] >> 63))
    return -1;
  int logn = 0;
  while ((int64_t)1 << logn < n) logn++;
  int64_t np2 = 1;
  while (np2 < n_in) np2 <<= 1;
  int skip = 0;
  while ((np2 << (skip + 1)) <= n) skip++;
  int32_t* idx = new int32_t[n];
  int64_t mask = ~(((int64_t)1 << skip) - 1);
  for (int64_t j = 0; j < n; j++) {
    int64_t jj = j & mask, r = 0;
    for (int b = 0; b < logn; b++) r |= ((jj >> b) & 1) << (logn - 1 - b);
    idx[j] = (int32_t)r;
  }
#pragma omp parallel for schedule(static)
  for (int64_t row = 0; row < k; row++) {
    const uint64_t* src = in + row * n_in * 4;
    uint64_t* x = out + row * n * 4;
    for (int64_t j = 0; j < n; j++) {
      int32_t s = idx[j];
      if (s < n_in) {
        for (int q = 0; q < 4; q++) x[4 * j + q] = src[4 * s + q];
      } else {
        for (int q = 0; q < 4; q++) x[4 * j + q] = 0;
      }
    }
    ntt_run_stages_w4(x, n, logn, skip, tw_mont, p4, n0inv);
  }
  delete[] idx;
  return 0;
}

// Batched inverse NTT over a 4-word field: forward transform with the
// INVERSE root's Montgomery twiddle table, then scale by n^-1 (supplied in
// the Montgomery domain so the scaling is one montmul per element).
int pos_intt_rows_w4(const uint64_t* in, int64_t k, uint64_t* out,
                     int64_t n, const uint64_t* p4, uint64_t n0inv,
                     const uint64_t* tw_inv_mont,
                     const uint64_t* n_inv_mont) {
  int rc = pos_ntt_rows_w4(in, k, n, out, n, p4, n0inv, tw_inv_mont);
  if (rc != 0) return rc;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < k * n; i++) {
    uint64_t r[4];
    mont_mul_w4(out + 4 * i, n_inv_mont, p4, n0inv, r);
    for (int q = 0; q < 4; q++) out[4 * i + q] = r[q];
  }
  return 0;
}

// Fused bytes -> 4-word values -> forward NTT for the PoS streaming writer
// (the w4 analogue of pos_ntt_rows_from_bytes_u64): each element reads
// `cap` data bytes (zero-padded past nbytes) as a big- or little-endian
// integer (DataField::from_byte_vec; ft253_192 is BE) directly into its
// bit-reversed NTT slot — no (k, n_per_row, 4) staging array, no python
// limb round trip.  out: (k, n, 4) evaluation rows.
int pos_ntt_rows_from_bytes_w4(const uint8_t* data, int64_t nbytes,
                               int64_t cap, int64_t k, int64_t n_in,
                               uint64_t* out, int64_t n, const uint64_t* p4,
                               uint64_t n0inv, const uint64_t* tw_mont,
                               int big_endian) {
  if (n < 2 || (n & (n - 1)) || n_in > n || n_in < 1 || cap > 32 ||
      (p4[3] >> 63))
    return -1;
  int logn = 0;
  while ((int64_t)1 << logn < n) logn++;
  int64_t np2 = 1;
  while (np2 < n_in) np2 <<= 1;
  int skip = 0;
  while ((np2 << (skip + 1)) <= n) skip++;
  int32_t* idx = new int32_t[n];
  int64_t mask = ~(((int64_t)1 << skip) - 1);
  for (int64_t j = 0; j < n; j++) {
    int64_t jj = j & mask, r = 0;
    for (int b = 0; b < logn; b++) r |= ((jj >> b) & 1) << (logn - 1 - b);
    idx[j] = (int32_t)r;
  }
#pragma omp parallel for schedule(static)
  for (int64_t row = 0; row < k; row++) {
    uint64_t* x = out + row * n * 4;
    for (int64_t j = 0; j < n; j++) {
      int32_t s = idx[j];
      uint64_t* w = x + 4 * j;
      w[0] = w[1] = w[2] = w[3] = 0;
      if (s < n_in) {
        int64_t off = (row * n_in + s) * cap;
        int64_t take = nbytes - off;
        if (take > cap) take = cap;
        if (take > 0) {
          const uint8_t* b = data + off;
          if (big_endian) {
            // the cap-byte chunk (zero-padded at the END) reads as one BE
            // integer (data_bytes_to_limbs_np), so byte t sits at bit
            // 8*(cap-1-t) even when the final chunk is truncated
            for (int64_t t = 0; t < take; t++) {
              int64_t bit = 8 * (cap - 1 - t);
              w[bit >> 6] |= (uint64_t)b[t] << (bit & 63);
            }
          } else {
            for (int64_t t = 0; t < take; t++)
              w[t >> 3] |= (uint64_t)b[t] << (8 * (t & 7));
          }
        }
      }
    }
    ntt_run_stages_w4(x, n, logn, skip, tw_mont, p4, n0inv);
  }
  delete[] idx;
  return 0;
}

// Fused scatter + column hash for 4-word rows: convert each element to its
// W=32-byte canonical repr (BE fields byte-reverse), memcpy the contiguous
// per-column run into the mapped .porenc region, and absorb it into that
// column's Blake3 state while cache-hot (the w4 analogue of
// pos_scatter_hash_u64).  src: (k, n, 4); dst points at the first byte of
// row `rows_written` of column 0; stride = row_capacity (elements).
void pos_scatter_hash_w4(const uint64_t* src, int64_t k, int64_t n,
                         uint8_t* dst, int64_t stride, PosColumnHasher* h,
                         int big_endian) {
  const int64_t B = 16;
#pragma omp parallel
  {
    uint8_t* buf = new uint8_t[B * k * 32];
#pragma omp for schedule(static)
    for (int64_t j0 = 0; j0 < n; j0 += B) {
      int64_t j1 = j0 + B < n ? j0 + B : n;
      for (int64_t j = j0; j < j1; j++) {
        uint8_t* col = buf + (j - j0) * k * 32;
        for (int64_t i = 0; i < k; i++) {
          const uint64_t* w = src + 4 * (i * n + j);
          uint8_t* o = col + 32 * i;
          if (big_endian) {
            for (int q = 3; q >= 0; q--)
              for (int b = 7; b >= 0; b--) *o++ = (uint8_t)(w[q] >> (8 * b));
          } else {
            memcpy(o, w, 32);
          }
        }
      }
      for (int64_t j = j0; j < j1; j++) {
        const uint8_t* col = buf + (j - j0) * k * 32;
        memcpy(dst + j * stride * 32, col, (size_t)k * 32);
        if (h) colhash_update_one(&h->cols[j], col, (size_t)k * 32);
      }
    }
    delete[] buf;
  }
}

}  // extern "C"
