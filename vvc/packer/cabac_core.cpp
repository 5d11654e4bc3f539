// Native CABAC packer: arithmetic engine + batched residual coding.
//
// TPU-native analog of the reference's native entropy coder
// (/root/reference/source/Lib/EncoderLib/BinEncoder.cpp,
//  DecoderLib/BinDecoder.cpp, CABACWriter/CABACReader residual_coding;
//  OpenVVC libovvc/vcl_cabac.c).  Per the locked architecture
// (SURVEY.md §7.0 tenet 4) the host packer is native C++ like the
// reference's, while bin *modeling* stays device-friendly.
//
// Semantics are the bit-exact mirror of the Python oracle
// vvc/cabac/engine.py + vvc/cabac/residual.py — every construct here has a
// line-for-line counterpart there, and tests/test_packer.py enforces
// byte-identical streams.  Context state is a shared int32 [n,4] array
// (s0, s1, rate0, rate1) owned by numpy.
//
// Build: g++ -O2 -shared -fPIC -o libcabac.so cabac_core.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int PROB_BITS = 15;
constexpr int HALF_PROB = 1 << 14;

struct CtxArray {
  int32_t* a;  // [n][4]
  int32_t& s0(int i) { return a[4 * i + 0]; }
  int32_t& s1(int i) { return a[4 * i + 1]; }
  int32_t r0(int i) { return a[4 * i + 2]; }
  int32_t r1(int i) { return a[4 * i + 3]; }
  int prob(int i) { return (s0(i) + s1(i)) >> 1; }
  int mps(int i) { return prob(i) >= HALF_PROB ? 1 : 0; }
  int lps_range(int i, int rng) {
    int p = prob(i);
    int q = p < HALF_PROB ? p : ((1 << PROB_BITS) - 1 - p);
    return (((q >> 9) * (rng >> 5)) >> 1) + 4;
  }
  void update(int i, int bin) {
    int target = bin << PROB_BITS;
    s0(i) += (target - s0(i)) >> r0(i);
    s1(i) += (target - s1(i)) >> r1(i);
  }
};

// ---------------------------------------------------------------- encoder

struct Enc {
  int low = 0;
  int range = 510;
  std::vector<uint8_t> bytes;
  uint32_t tail = 0;
  int ntail = 0;
  int64_t nbits = 0;

  void emit(int bit) {
    tail = (tail << 1) | (unsigned)bit;
    ntail++;
    nbits++;
    if (ntail == 8) {
      bytes.push_back((uint8_t)tail);
      tail = 0;
      ntail = 0;
    }
  }
  void carry() {
    tail += 1;
    if (tail >> ntail) {
      tail = ntail == 0 ? 0 : (tail & ((1u << ntail) - 1));
      int i = (int)bytes.size() - 1;
      while (i >= 0 && bytes[i] == 0xFF) bytes[i--] = 0;
      // i >= 0 guaranteed by the interval invariant (see engine.py)
      if (i >= 0) bytes[i]++;
    }
  }
  void renorm() {
    while (range < 256) {
      emit(low >> 8);
      low = (low & 0xFF) << 1;
      range <<= 1;
    }
  }
  void bin(CtxArray& c, int i, int b) {
    int rlps = c.lps_range(i, range);
    int m = c.mps(i);
    range -= rlps;
    if (b != m) {
      low += range;
      if (low >= 512) {
        carry();
        low -= 512;
      }
      range = rlps;
    }
    c.update(i, b);
    renorm();
  }
  void ep(int b) {
    int x = (low << 1) + (b ? range : 0);
    if (x >= 1024) {
      carry();
      x -= 1024;
    }
    emit(x >> 9);
    low = x & 0x1FF;
  }
  void eps(uint32_t v, int n) {
    for (int i = n - 1; i >= 0; i--) ep((v >> i) & 1);
  }
  void trm(int b) {
    range -= 2;
    if (b) {
      low += range;
      if (low >= 512) {
        carry();
        low -= 512;
      }
      range = 2;
    }
    renorm();
  }
  void finish() {
    int v = low + 1;
    for (int i = 8; i >= 0; i--) emit((v >> i) & 1);
    while (ntail != 0) emit(0);
  }
};

// ---------------------------------------------------------------- decoder

struct Dec {
  const uint8_t* data;
  int64_t len;
  int64_t pos = 0;
  int range = 510;
  int offset = 0;

  Dec(const uint8_t* d, int64_t l) : data(d), len(l) {
    for (int i = 0; i < 9; i++) offset = (offset << 1) | bit();
  }
  int bit() {
    int64_t p = pos++;
    if ((p >> 3) >= len) return 0;
    return (data[p >> 3] >> (7 - (p & 7))) & 1;
  }
  int bin(CtxArray& c, int i) {
    int rlps = c.lps_range(i, range);
    int m = c.mps(i);
    range -= rlps;
    int b;
    if (offset >= range) {
      b = 1 - m;
      offset -= range;
      range = rlps;
    } else {
      b = m;
    }
    c.update(i, b);
    while (range < 256) {
      range <<= 1;
      offset = (offset << 1) | bit();
    }
    return b;
  }
  int ep() {
    offset = (offset << 1) | bit();
    if (offset >= range) {
      offset -= range;
      return 1;
    }
    return 0;
  }
  uint32_t eps(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; i++) v = (v << 1) | (unsigned)ep();
    return v;
  }
  int trm() {
    range -= 2;
    if (offset >= range) return 1;
    while (range < 256) {
      range <<= 1;
      offset = (offset << 1) | bit();
    }
    return 0;
  }
};

// ------------------------------------------------------------ scan tables

struct ScanTables {
  // forward scan positions for an SxS TB (CGs diagonal, 4x4 diag inside)
  std::vector<int> sx, sy;   // [nposs]
  std::vector<int> cg_index; // [sbw*sbw] (cgy*sbw+cgx) -> sb scan index
  int nposs = 0, sbw = 1;
};

void diag_scan(int w, int h, std::vector<int>& xs, std::vector<int>& ys) {
  for (int d = 0; d < w + h - 1; d++) {
    int y = d < h ? d : h - 1;
    while (y >= 0 && (d - y) < w) {
      xs.push_back(d - y);
      ys.push_back(y);
      y--;
    }
  }
}

const ScanTables& scan_tables(int log2s) {
  static ScanTables cache[7];
  static bool init[7] = {false};
  if (!init[log2s]) {
    ScanTables& t = cache[log2s];
    int s = 1 << log2s;
    if (s < 4) {
      diag_scan(s, s, t.sx, t.sy);
      t.sbw = 1;
      t.cg_index.assign(1, 0);
    } else {
      std::vector<int> cx, cy, ix, iy;
      diag_scan(s >> 2, s >> 2, cx, cy);
      diag_scan(4, 4, ix, iy);
      t.sbw = s >> 2;
      t.cg_index.assign(t.sbw * t.sbw, 0);
      for (size_t g = 0; g < cx.size(); g++) {
        t.cg_index[cy[g] * t.sbw + cx[g]] = (int)g;
        for (int k = 0; k < 16; k++) {
          t.sx.push_back(cx[g] * 4 + ix[k]);
          t.sy.push_back(cy[g] * 4 + iy[k]);
        }
      }
    }
    t.nposs = (int)t.sx.size();
    init[log2s] = true;
  }
  return cache[log2s];
}

// ------------------------------------------------- residual coding shared

int group_idx(int v) {
  if (v < 4) return v;
  int k = 31 - __builtin_clz((unsigned)v);
  return (k << 1) + ((v >> (k - 1)) & 1);
}
int min_in_group(int g) {
  if (g < 4) return g;
  return (2 + (g & 1)) << ((g >> 1) - 1);
}
int last_ctx(int bin_idx, int log2s, int is_luma) {
  int offset, shift;
  if (is_luma) {
    offset = 3 * (log2s - 2) + ((log2s - 1) >> 2);
    shift = (log2s + 1) >> 2;
  } else {
    offset = 0;
    shift = log2s - 2 > 0 ? log2s - 2 : 0;
  }
  return offset + (bin_idx >> shift);
}

// residual set order — keep in sync with vvc/cabac/ctx.py RESIDUAL_SET_ORDER
enum RSet {
  R_LAST_X_LUMA = 0, R_LAST_Y_LUMA, R_LAST_X_CHROMA, R_LAST_Y_CHROMA,
  R_SB_LUMA, R_SB_CHROMA, R_SIG_LUMA, R_SIG_CHROMA, R_GT1_LUMA,
  R_GT1_CHROMA, R_PAR_LUMA, R_PAR_CHROMA, R_GT3_LUMA, R_GT3_CHROMA,
  R_NSETS
};

struct ResCtx {
  CtxArray ctx;
  const int32_t* off;  // [R_NSETS] offsets into ctx array
  int idx(int set, int i) const { return off[set] + i; }
};

int templ_sum(const int32_t* m, int s, int x, int y) {
  static const int dx[5] = {1, 2, 0, 0, 1};
  static const int dy[5] = {0, 0, 1, 2, 1};
  int acc = 0;
  for (int k = 0; k < 5; k++) {
    int nx = x + dx[k], ny = y + dy[k];
    if (nx < s && ny < s) acc += m[ny * s + nx];
  }
  return acc;
}
int sig_ctx(int x, int y, const int32_t* p1, int s, int is_luma) {
  int acc = templ_sum(p1, s, x, y);
  int diag = x + y;
  int base;
  if (is_luma)
    base = diag < 2 ? 8 : (diag < 5 ? 4 : 0);
  else
    base = diag < 2 ? 4 : 0;
  int o = (acc + 1) >> 1;
  return base + (o < 3 ? o : 3);
}
int gtx_ctx(int x, int y, const int32_t* p1, int s, int is_luma) {
  int acc = templ_sum(p1, s, x, y);
  if (acc > 4) acc = 4;
  if (is_luma) {
    int diag = x + y;
    int base = diag == 0 ? 10 : (diag < 3 ? 5 : 0);
    return base + acc;
  }
  return acc;
}
int rice_param(int x, int y, const int32_t* full, int s) {
  int acc = templ_sum(full, s, x, y);
  if (acc < 7) return 0;
  if (acc < 14) return 1;
  if (acc < 28) return 2;
  return 3;
}

constexpr int GR_THRESH = 6;

void write_gr(Enc& e, int rem, int rice) {
  int q = rem >> rice;
  if (q < GR_THRESH) {
    for (int i = 0; i < q; i++) e.ep(1);
    e.ep(0);
    if (rice) e.eps((unsigned)rem & ((1u << rice) - 1), rice);
  } else {
    for (int i = 0; i < GR_THRESH; i++) e.ep(1);
    int v = rem - (GR_THRESH << rice);
    int m = rice + 1;
    while (v >= (1 << m)) {
      e.ep(1);
      v -= 1 << m;
      m++;
    }
    e.ep(0);
    e.eps((unsigned)v, m);
  }
}
int read_gr(Dec& d, int rice) {
  int q = 0;
  while (q < GR_THRESH && d.ep()) q++;
  if (q < GR_THRESH) {
    int rem = q << rice;
    if (rice) rem |= (int)d.eps(rice);
    return rem;
  }
  int m = rice + 1;
  int v = GR_THRESH << rice;
  while (d.ep()) {
    v += 1 << m;
    m++;
  }
  return v + (int)d.eps(m);
}

// -------------------------------------------------------- residual encode

void enc_residual(Enc& e, ResCtx& rc, const int32_t* levels, int s,
                  int is_luma) {
  int log2s = 0;
  while ((1 << log2s) < s) log2s++;
  const ScanTables& t = scan_tables(log2s);
  int nposs = t.nposs;

  int last = -1;
  for (int i = nposs - 1; i >= 0; i--)
    if (levels[t.sy[i] * s + t.sx[i]] != 0) {
      last = i;
      break;
    }
  int lx = t.sx[last], ly = t.sy[last];
  int set_x = is_luma ? R_LAST_X_LUMA : R_LAST_X_CHROMA;
  int set_y = is_luma ? R_LAST_Y_LUMA : R_LAST_Y_CHROMA;
  int gmax = group_idx(s - 1);
  int coords[2] = {lx, ly};
  int sets[2] = {set_x, set_y};
  for (int c = 0; c < 2; c++) {
    int g = group_idx(coords[c]);
    for (int i = 0; i < (g < gmax ? g : gmax); i++)
      e.bin(rc.ctx, rc.idx(sets[c], last_ctx(i, log2s, is_luma)), 1);
    if (g < gmax)
      e.bin(rc.ctx, rc.idx(sets[c], last_ctx(g, log2s, is_luma)), 0);
  }
  for (int c = 0; c < 2; c++) {
    int g = group_idx(coords[c]);
    if (g > 3) e.eps((unsigned)(coords[c] - min_in_group(g)), (g >> 1) - 1);
  }

  int set_sb = is_luma ? R_SB_LUMA : R_SB_CHROMA;
  int set_sig = is_luma ? R_SIG_LUMA : R_SIG_CHROMA;
  int set_gt1 = is_luma ? R_GT1_LUMA : R_GT1_CHROMA;
  int set_par = is_luma ? R_PAR_LUMA : R_PAR_CHROMA;
  int set_gt3 = is_luma ? R_GT3_LUMA : R_GT3_CHROMA;

  int last_sb = last >> 4;
  std::vector<int32_t> p1(s * s, 0), full(s * s, 0);
  std::vector<int32_t> sb_coded((nposs + 15) >> 4, 0);
  int sbw = t.sbw;
  std::vector<int> gt3_pos, nz_pos;

  for (int sb = last_sb; sb >= 0; sb--) {
    int sb_end = (sb + 1) * 16 < nposs ? (sb + 1) * 16 : nposs;
    int sb_has = 0;
    for (int i = sb * 16; i < sb_end; i++)
      if (levels[t.sy[i] * s + t.sx[i]] != 0) {
        sb_has = 1;
        break;
      }
    int expl = (sb != last_sb && sb != 0);
    if (expl) {
      int cgx = t.sx[sb * 16] >> 2, cgy = t.sy[sb * 16] >> 2;
      int nb = 0;
      if (cgx + 1 < sbw && sb_coded[t.cg_index[cgy * sbw + cgx + 1]]) nb = 1;
      if (cgy + 1 < sbw && sb_coded[t.cg_index[(cgy + 1) * sbw + cgx]]) nb = 1;
      e.bin(rc.ctx, rc.idx(set_sb, nb), sb_has);
    }
    sb_coded[sb] = (sb_has || !expl) ? 1 : 0;
    if (!sb_coded[sb]) continue;

    int start = (sb == last_sb) ? last : sb_end - 1;
    int sig_found = 0;
    gt3_pos.clear();
    nz_pos.clear();
    for (int i = start; i >= sb * 16; i--) {
      int x = t.sx[i], y = t.sy[i];
      int32_t lv = levels[y * s + x];
      int a = lv < 0 ? -lv : lv;
      int sig;
      if (i == last) {
        sig = 1;
      } else {
        int infer_dc = expl && (i == sb * 16) && !sig_found;
        if (infer_dc) {
          sig = 1;
        } else {
          sig = a > 0 ? 1 : 0;
          e.bin(rc.ctx, rc.idx(set_sig, sig_ctx(x, y, p1.data(), s, is_luma)),
                sig);
        }
      }
      if (sig) {
        sig_found = 1;
        nz_pos.push_back(i);
        int gctx = gtx_ctx(x, y, p1.data(), s, is_luma);
        int gt1 = a > 1 ? 1 : 0;
        e.bin(rc.ctx, rc.idx(set_gt1, gctx), gt1);
        int par = 0, gt3 = 0;
        if (gt1) {
          par = (a - 2) & 1;
          e.bin(rc.ctx, rc.idx(set_par, gctx), par);
          gt3 = a > 3 ? 1 : 0;
          e.bin(rc.ctx, rc.idx(set_gt3, gctx), gt3);
          if (gt3) gt3_pos.push_back(i);
        }
        p1[y * s + x] = 1 + gt1 + par + 2 * gt3;
        full[y * s + x] = p1[y * s + x];
      }
    }
    for (int i : gt3_pos) {
      int x = t.sx[i], y = t.sy[i];
      int32_t lv = levels[y * s + x];
      int a = lv < 0 ? -lv : lv;
      int par = (a - 2) & 1;
      int rem = (a - 4 - par) >> 1;
      write_gr(e, rem, rice_param(x, y, full.data(), s));
      full[y * s + x] += 2 * rem;
    }
    for (int i : nz_pos) {
      int x = t.sx[i], y = t.sy[i];
      e.ep(levels[y * s + x] < 0 ? 1 : 0);
    }
  }
}

// -------------------------------------------------------- residual decode

void dec_residual(Dec& d, ResCtx& rc, int32_t* levels, int s, int is_luma) {
  int log2s = 0;
  while ((1 << log2s) < s) log2s++;
  const ScanTables& t = scan_tables(log2s);
  int nposs = t.nposs;
  std::memset(levels, 0, sizeof(int32_t) * s * s);

  int set_x = is_luma ? R_LAST_X_LUMA : R_LAST_X_CHROMA;
  int set_y = is_luma ? R_LAST_Y_LUMA : R_LAST_Y_CHROMA;
  int gmax = group_idx(s - 1);
  int groups[2];
  int sets[2] = {set_x, set_y};
  for (int c = 0; c < 2; c++) {
    int g = 0;
    while (g < gmax &&
           d.bin(rc.ctx, rc.idx(sets[c], last_ctx(g, log2s, is_luma))))
      g++;
    groups[c] = g;
  }
  int coords[2];
  for (int c = 0; c < 2; c++) {
    int v = min_in_group(groups[c]);
    if (groups[c] > 3) v += (int)d.eps((groups[c] >> 1) - 1);
    coords[c] = v;
  }
  int last = -1;
  for (int i = 0; i < nposs; i++)
    if (t.sx[i] == coords[0] && t.sy[i] == coords[1]) {
      last = i;
      break;
    }

  int set_sb = is_luma ? R_SB_LUMA : R_SB_CHROMA;
  int set_sig = is_luma ? R_SIG_LUMA : R_SIG_CHROMA;
  int set_gt1 = is_luma ? R_GT1_LUMA : R_GT1_CHROMA;
  int set_par = is_luma ? R_PAR_LUMA : R_PAR_CHROMA;
  int set_gt3 = is_luma ? R_GT3_LUMA : R_GT3_CHROMA;

  int last_sb = last >> 4;
  std::vector<int32_t> p1(s * s, 0), full(s * s, 0);
  std::vector<int32_t> sb_coded((nposs + 15) >> 4, 0);
  int sbw = t.sbw;
  std::vector<int> gt3_pos, nz_pos;

  for (int sb = last_sb; sb >= 0; sb--) {
    int sb_end = (sb + 1) * 16 < nposs ? (sb + 1) * 16 : nposs;
    int expl = (sb != last_sb && sb != 0);
    int coded;
    if (expl) {
      int cgx = t.sx[sb * 16] >> 2, cgy = t.sy[sb * 16] >> 2;
      int nb = 0;
      if (cgx + 1 < sbw && sb_coded[t.cg_index[cgy * sbw + cgx + 1]]) nb = 1;
      if (cgy + 1 < sbw && sb_coded[t.cg_index[(cgy + 1) * sbw + cgx]]) nb = 1;
      coded = d.bin(rc.ctx, rc.idx(set_sb, nb));
    } else {
      coded = 1;
    }
    sb_coded[sb] = coded;
    if (!coded) continue;

    int start = (sb == last_sb) ? last : sb_end - 1;
    int sig_found = 0;
    gt3_pos.clear();
    nz_pos.clear();
    for (int i = start; i >= sb * 16; i--) {
      int x = t.sx[i], y = t.sy[i];
      int sig;
      if (i == last) {
        sig = 1;
      } else {
        int infer_dc = expl && (i == sb * 16) && !sig_found;
        sig = infer_dc
                  ? 1
                  : d.bin(rc.ctx,
                          rc.idx(set_sig, sig_ctx(x, y, p1.data(), s, is_luma)));
      }
      if (sig) {
        sig_found = 1;
        nz_pos.push_back(i);
        int gctx = gtx_ctx(x, y, p1.data(), s, is_luma);
        int gt1 = d.bin(rc.ctx, rc.idx(set_gt1, gctx));
        int par = 0, gt3 = 0;
        if (gt1) {
          par = d.bin(rc.ctx, rc.idx(set_par, gctx));
          gt3 = d.bin(rc.ctx, rc.idx(set_gt3, gctx));
          if (gt3) gt3_pos.push_back(i);
        }
        int v = 1 + gt1 + par + 2 * gt3;
        p1[y * s + x] = v;
        full[y * s + x] = v;
        levels[y * s + x] = v;
      }
    }
    for (int i : gt3_pos) {
      int x = t.sx[i], y = t.sy[i];
      int rem = read_gr(d, rice_param(x, y, full.data(), s));
      levels[y * s + x] += 2 * rem;
      full[y * s + x] = levels[y * s + x];
    }
    for (int i : nz_pos) {
      int x = t.sx[i], y = t.sy[i];
      if (d.ep()) levels[y * s + x] = -levels[y * s + x];
    }
  }
}

}  // namespace

// ------------------------------------------------------------------ C API

extern "C" {

void* enc_create() { return new Enc(); }
void enc_destroy(void* e) { delete (Enc*)e; }
void enc_bin(void* e, int32_t* states, int idx, int bin) {
  CtxArray c{states};
  ((Enc*)e)->bin(c, idx, bin);
}
void enc_ep(void* e, int bin) { ((Enc*)e)->ep(bin); }
void enc_eps(void* e, uint32_t v, int n) { ((Enc*)e)->eps(v, n); }
void enc_trm(void* e, int bin) { ((Enc*)e)->trm(bin); }
void enc_residual_c(void* e, int32_t* states, const int32_t* offsets,
                    const int32_t* levels, int size, int is_luma) {
  ResCtx rc{CtxArray{states}, offsets};
  enc_residual(*(Enc*)e, rc, levels, size, is_luma);
}
int64_t enc_finish(void* e, uint8_t* out, int64_t cap) {
  Enc* enc = (Enc*)e;
  enc->finish();
  int64_t n = (int64_t)enc->bytes.size();
  if (n > cap) return -n;
  std::memcpy(out, enc->bytes.data(), (size_t)n);
  return n;
}
int64_t enc_bit_count(void* e) { return ((Enc*)e)->nbits + 9; }

void* dec_create(const uint8_t* data, int64_t len) { return new Dec(data, len); }
void dec_destroy(void* d) { delete (Dec*)d; }
int dec_bin(void* d, int32_t* states, int idx) {
  CtxArray c{states};
  return ((Dec*)d)->bin(c, idx);
}
int dec_ep(void* d) { return ((Dec*)d)->ep(); }
uint32_t dec_eps(void* d, int n) { return ((Dec*)d)->eps(n); }
int dec_trm(void* d) { return ((Dec*)d)->trm(); }
void dec_residual_c(void* d, int32_t* states, const int32_t* offsets,
                    int32_t* levels, int size, int is_luma) {
  ResCtx rc{CtxArray{states}, offsets};
  dec_residual(*(Dec*)d, rc, levels, size, is_luma);
}

}  // extern "C"
