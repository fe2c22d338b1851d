// Deflate device-tier PLANNER (native runtime component).
//
// The TPU deflate decode tier splits the work like the zstd tier does
// (zstd/device_prep.py): the host builds the entropy tables and block
// plan, the device kernel (ops/deflate_pallas_w.py) performs the full
// bit-level symbol decode + LZ77 execution from the raw bitstream.
// Deflate differs from zstd in one structural way: block boundaries are
// NOT length-prefixed (RFC 1951 — the end-of-block symbol is itself
// Huffman coded), so locating block 2's header requires decoding block
// 1's symbols. That boundary scan is this planner's job: it walks each
// chunk's blocks, builds the two-level canonical Huffman LUTs in the
// device entry encoding, records (type, data_bitpos, table bases,
// stored extents) per block, and validates the stream. The device
// kernel then re-derives every output byte from the bitstream itself.
//
// Reference parity: deflate/DeflateNative.java:28-40 (the libdeflate
// binding this tier is the TPU analogue of); RFC 1951 fixed/dynamic/
// stored block grammar.
//
// Device entry encoding (int32, always non-negative):
//   e = (op << 28) | (nbits << 22) | val
//   op 0 INVALID, 1 LITERAL (val = byte), 2 LENGTH (val = extra<<9|base),
//   3 DIST (val = extra<<16|base), 4 END-OF-BLOCK,
//   5 SUBTABLE (val = entry index of subtable, nbits = sub index width).
// Root tables are 9-bit (512 entries); long codes chain through one
// subtable lookup whose entries carry the TOTAL code length.

#include "common.h"

namespace {

constexpr int ROOTB = 9;
constexpr int ROOTSZ = 1 << ROOTB;
constexpr int MAX_BLOCKS = 16;
constexpr int DESC_FIELDS = 8;  // 16 blocks x 8 fields = one 128-lane row
constexpr int OP_INVALID = 0, OP_LIT = 1, OP_LEN = 2, OP_DIST = 3,
              OP_EOB = 4, OP_SUB = 5;

constexpr uint16_t LBASE[29] = {3,  4,  5,  6,  7,  8,  9,  10, 11,  13,
                                15, 17, 19, 23, 27, 31, 35, 43, 51,  59,
                                67, 83, 99, 115, 131, 163, 195, 227, 258};
constexpr uint8_t LEXT[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2,
                              2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0};
constexpr uint16_t DBASE[30] = {1,    2,    3,    4,    5,    7,    9,
                                13,   17,   25,   33,   49,   65,   97,
                                129,  193,  257,  385,  513,  769,  1025,
                                1537, 2049, 3073, 4097, 6145, 8193, 12289,
                                16385, 24577};
constexpr uint8_t DEXT[30] = {0, 0, 0,  0,  1,  1,  2,  2,  3,  3,
                              4, 4, 5,  5,  6,  6,  7,  7,  8,  8,
                              9, 9, 10, 10, 11, 11, 12, 12, 13, 13};
constexpr uint8_t CLPERM[19] = {16, 17, 18, 0, 8,  7, 9,  6, 10, 5,
                                11, 4,  12, 3, 13, 2, 14, 1, 15};

inline int32_t mk(int op, int nbits, int val) {
  return (op << 28) | (nbits << 22) | val;
}

inline uint32_t bitrev(uint32_t v, int n) {
  uint32_t r = 0;
  for (int i = 0; i < n; i++) { r = (r << 1) | (v & 1); v >>= 1; }
  return r;
}

struct BitReader {
  const uint8_t* p;
  size_t n;       // bytes
  size_t bitpos = 0;
  bool overrun = false;

  uint32_t peek(int k, size_t at) const {
    // LSB-first; zero-padded past the end (overrun is flagged on consume)
    size_t byte = at >> 3;
    uint64_t w = 0;
    for (int i = 0; i < 5; i++)
      w |= uint64_t(byte + i < n ? p[byte + i] : 0) << (8 * i);
    return uint32_t((w >> (at & 7)) & ((1u << k) - 1));
  }
  uint32_t bits(int k) {
    uint32_t v = peek(k, bitpos);
    bitpos += k;
    if (bitpos > n * 8) overrun = true;
    return v;
  }
};

// Map a decoded symbol to its device entry (litlen or dist alphabet).
inline int32_t sym_entry(int sym, int len, bool litlen) {
  if (litlen) {
    if (sym < 256) return mk(OP_LIT, len, sym);
    if (sym == 256) return mk(OP_EOB, len, 0);
    if (sym <= 285)
      return mk(OP_LEN, len, (LEXT[sym - 257] << 9) | LBASE[sym - 257]);
    return mk(OP_INVALID, len, 0);  // 286/287: never valid in data
  }
  if (sym < 30) return mk(OP_DIST, len, (DEXT[sym] << 16) | DBASE[sym]);
  return mk(OP_INVALID, len, 0);  // 30/31: participate in the code only
}

// Build a two-level canonical table into tab[used..]; returns the root
// base entry index, or -1 on over-subscription, -2 on page overflow.
// Incomplete codes are permitted (missing patterns stay OP_INVALID and
// error out only if the stream actually uses them — the same lenient-
// safe policy the scan below enforces).
int build_table(const uint8_t* lens, int n, bool litlen, int32_t* tab,
                int& used, int tab_cap) {
  int count[16] = {0};
  for (int s = 0; s < n; s++) count[lens[s]]++;
  int left = 1;
  for (int l = 1; l <= 15; l++) {
    left <<= 1;
    left -= count[l];
    if (left < 0) return -1;
  }
  int base = used;
  if (base + ROOTSZ > tab_cap) return -2;
  for (int i = 0; i < ROOTSZ; i++) tab[base + i] = 0;
  used += ROOTSZ;
  if (count[0] == n) return base;  // no codes at all: all-invalid root

  // canonical first-codes
  uint32_t code = 0, first[16];
  for (int l = 1; l <= 15; l++) {
    code = (code + count[l - 1]) << 1;
    first[l] = code;
  }
  uint32_t next[16];
  for (int l = 1; l <= 15; l++) next[l] = first[l];

  // pass 1: per-root-prefix max length for long codes -> subtable sizes
  int sub_max[ROOTSZ];
  for (int i = 0; i < ROOTSZ; i++) sub_max[i] = 0;
  {
    uint32_t nx[16];
    for (int l = 1; l <= 15; l++) nx[l] = first[l];
    for (int s = 0; s < n; s++) {
      int l = lens[s];
      if (l == 0) continue;
      uint32_t c = nx[l]++;
      if (l > ROOTB) {
        uint32_t rev = bitrev(c, l);
        int prefix = rev & (ROOTSZ - 1);
        if (l > sub_max[prefix]) sub_max[prefix] = l;
      }
    }
  }
  int sub_base[ROOTSZ];
  for (int prefix = 0; prefix < ROOTSZ; prefix++) {
    if (!sub_max[prefix]) continue;
    int sbits = sub_max[prefix] - ROOTB;
    int ssz = 1 << sbits;
    if (used + ssz > tab_cap) return -2;
    sub_base[prefix] = used;
    for (int i = 0; i < ssz; i++) tab[used + i] = 0;
    tab[base + prefix] = mk(OP_SUB, sbits, used);
    used += ssz;
  }

  // pass 2: fill
  for (int s = 0; s < n; s++) {
    int l = lens[s];
    if (l == 0) continue;
    uint32_t c = next[l]++;
    uint32_t rev = bitrev(c, l);
    int32_t e = sym_entry(s, l, litlen);
    if (l <= ROOTB) {
      for (uint32_t i = rev; i < uint32_t(ROOTSZ); i += 1u << l)
        tab[base + i] = e;
    } else {
      int prefix = rev & (ROOTSZ - 1);
      int sbits = sub_max[prefix] - ROOTB;
      int sb = sub_base[prefix];
      for (uint32_t i = rev >> ROOTB; i < (1u << sbits);
           i += 1u << (l - ROOTB))
        tab[sb + i] = e;
    }
  }
  return base;
}

// Decode one symbol with the just-built device tables (the planner uses
// the exact lookup discipline the kernel will).
inline int32_t lookup(const int32_t* tab, int base, BitReader& br) {
  uint32_t peek = br.peek(15, br.bitpos);
  int32_t e = tab[base + (peek & (ROOTSZ - 1))];
  if ((e >> 28) == OP_SUB) {
    int sbits = (e >> 22) & 63;
    e = tab[(e & 0x3FFFFF) + ((peek >> ROOTB) & ((1u << sbits) - 1))];
  }
  int nbits = (e >> 22) & 63;
  if ((e >> 28) == OP_INVALID || nbits == 0) return 0;
  br.bitpos += nbits;
  if (br.bitpos > br.n * 8) br.overrun = true;
  return e;
}

constexpr int ST_OK = 0, ST_FALLBACK = 1, ST_MALFORMED = 2;

int plan_chunk(const uint8_t* src, int32_t src_len, int32_t* desc,
               int32_t* tab, int32_t tab_cap, int32_t out_cap,
               int32_t* out_len, int32_t* nblocks, int32_t* tab_used) {
  for (int i = 0; i < 128; i++) desc[i] = 0;
  BitReader br{src, size_t(src_len)};
  int used = 128;  // entry index 0..127 is the descriptor row itself
  int nb = 0;
  int64_t out = 0;
  int fixed_ll = -1, fixed_d = -1;
  uint8_t lens[320];

  for (;;) {
    if (nb >= MAX_BLOCKS) return ST_FALLBACK;
    uint32_t bfinal = br.bits(1);
    uint32_t btype = br.bits(2);
    if (br.overrun) return ST_MALFORMED;
    int32_t* d = desc + nb * DESC_FIELDS;
    d[6] = int32_t(bfinal);

    if (btype == 0) {  // stored
      br.bitpos = (br.bitpos + 7) & ~size_t(7);
      uint32_t len = br.bits(16), nlen = br.bits(16);
      if (br.overrun || ((len ^ nlen) & 0xFFFF) != 0xFFFF)
        return ST_MALFORMED;
      d[0] = 0;
      d[4] = int32_t(br.bitpos >> 3);
      d[5] = int32_t(len);
      br.bitpos += size_t(len) * 8;
      if (br.bitpos > br.n * 8) return ST_MALFORMED;
      out += len;
    } else if (btype == 1 || btype == 2) {
      int llbase, dbase;
      if (btype == 1) {  // fixed
        if (fixed_ll < 0) {
          for (int s = 0; s < 144; s++) lens[s] = 8;
          for (int s = 144; s < 256; s++) lens[s] = 9;
          for (int s = 256; s < 280; s++) lens[s] = 7;
          for (int s = 280; s < 288; s++) lens[s] = 8;
          fixed_ll = build_table(lens, 288, true, tab, used, tab_cap);
          for (int s = 0; s < 32; s++) lens[s] = 5;
          fixed_d = build_table(lens, 32, false, tab, used, tab_cap);
          if (fixed_ll == -2 || fixed_d == -2) return ST_FALLBACK;
        }
        llbase = fixed_ll;
        dbase = fixed_d;
      } else {  // dynamic
        uint32_t hlit = br.bits(5) + 257;
        uint32_t hdist = br.bits(5) + 1;
        uint32_t hclen = br.bits(4) + 4;
        if (br.overrun || hlit > 286 || hdist > 30) return ST_MALFORMED;
        uint8_t cl[19] = {0};
        for (uint32_t i = 0; i < hclen; i++) cl[CLPERM[i]] = uint8_t(br.bits(3));
        if (br.overrun) return ST_MALFORMED;
        // tiny flat 7-bit code-length decode table (local)
        int16_t clt[128];
        for (int i = 0; i < 128; i++) clt[i] = -1;
        {
          int ccount[8] = {0};
          for (int s = 0; s < 19; s++) ccount[cl[s]]++;
          int cleft = 1;
          for (int l = 1; l <= 7; l++) {
            cleft <<= 1;
            cleft -= ccount[l];
            if (cleft < 0) return ST_MALFORMED;
          }
          uint32_t ccode = 0, cnext[8];
          for (int l = 1; l <= 7; l++) {
            ccode = (ccode + ccount[l - 1]) << 1;
            cnext[l] = ccode;
          }
          for (int s = 0; s < 19; s++) {
            int l = cl[s];
            if (!l) continue;
            uint32_t rev = bitrev(cnext[l]++, l);
            for (uint32_t i = rev; i < 128; i += 1u << l)
              clt[i] = int16_t((l << 8) | s);
          }
        }
        uint32_t total = hlit + hdist;
        uint32_t got = 0;
        while (got < total) {
          int16_t e = clt[br.peek(7, br.bitpos)];
          if (e < 0) return ST_MALFORMED;
          br.bitpos += e >> 8;
          if (br.bitpos > br.n * 8) return ST_MALFORMED;
          int sym = e & 0xFF;
          if (sym < 16) {
            lens[got++] = uint8_t(sym);
          } else if (sym == 16) {
            if (got == 0) return ST_MALFORMED;
            uint32_t rep = 3 + br.bits(2);
            uint8_t v = lens[got - 1];
            if (br.overrun || got + rep > total) return ST_MALFORMED;
            while (rep--) lens[got++] = v;
          } else {
            uint32_t rep = sym == 17 ? 3 + br.bits(3) : 11 + br.bits(7);
            if (br.overrun || got + rep > total) return ST_MALFORMED;
            while (rep--) lens[got++] = 0;
          }
        }
        if (lens[256] == 0) return ST_MALFORMED;  // no end-of-block code
        llbase = build_table(lens, int(hlit), true, tab, used, tab_cap);
        uint8_t dlens[32];
        for (uint32_t i = 0; i < hdist; i++) dlens[i] = lens[hlit + i];
        dbase = build_table(dlens, int(hdist), false, tab, used, tab_cap);
      }
      if (llbase == -1 || dbase == -1) return ST_MALFORMED;
      if (llbase == -2 || dbase == -2) return ST_FALLBACK;
      d[0] = 1;
      d[1] = int32_t(br.bitpos);
      d[2] = llbase;
      d[3] = dbase;

      // boundary scan: decode this block's symbols to find its EOB
      for (;;) {
        int32_t e = lookup(tab, llbase, br);
        if (!e || br.overrun) return ST_MALFORMED;
        int op = e >> 28;
        if (op == OP_LIT) {
          out++;
        } else if (op == OP_EOB) {
          break;
        } else if (op == OP_LEN) {
          int val = e & 0x3FFFFF;
          int extra = val >> 9;
          int mlen = (val & 511) + int(br.bits(extra));
          int32_t de = lookup(tab, dbase, br);
          if (!de || br.overrun || (de >> 28) != OP_DIST)
            return ST_MALFORMED;
          int dval = de & 0x3FFFFF;
          int dist = (dval & 0xFFFF) + int(br.bits(dval >> 16));
          if (br.overrun || dist > out || dist > 32768) return ST_MALFORMED;
          out += mlen;
        } else {
          return ST_MALFORMED;
        }
        if (out > out_cap) return ST_FALLBACK;
      }
    } else {
      return ST_MALFORMED;  // btype 3 reserved
    }
    nb++;
    if (out > out_cap) return ST_FALLBACK;
    if (bfinal) break;
  }
  *out_len = int32_t(out);
  *nblocks = nb;
  *tab_used = used;
  return ST_OK;
}

}  // namespace

extern "C" {

// Batch planner: src is (B, cap) row-major; per chunk writes the 128-lane
// descriptor row, the table page (tab_cap int32 entries), and
// info[i*4] = {out_len, nblocks, tab_used, status(0 ok/1 fallback/2 bad)}.
void actpu_inflate_plan_batch(const uint8_t* src, int64_t B, int64_t cap,
                              const int32_t* lens, int32_t tab_cap,
                              int32_t out_cap, int32_t* desc, int32_t* tabs,
                              int32_t* info) {
  for (int64_t i = 0; i < B; i++) {
    int32_t out_len = 0, nblocks = 0, tab_used = 0;
    int st = plan_chunk(src + i * cap, lens[i], desc + i * 128,
                        tabs + i * int64_t(tab_cap), tab_cap, out_cap,
                        &out_len, &nblocks, &tab_used);
    info[i * 4 + 0] = out_len;
    info[i * 4 + 1] = nblocks;
    info[i * 4 + 2] = tab_used;
    info[i * 4 + 3] = st;
  }
}

}  // extern "C"
