// robocup_engine — C++ inference engine for the net.cfg + weights.dat
// deployment contract.
//
// The reference repo ships cfg/weight artifacts consumed by an external C++
// engine on the NAO robot (reference paramSave.py:5-18, weights/net.cfg,
// testDumper.py golden vectors); the engine itself is not in the repo. This
// is that engine, rebuilt: it parses the darknet-style cfg emitted by
// robocupvision_tpu.export.netcfg, streams the flat float32 weights in
// state_dict order, and runs NCHW inference for every layer type the
// format (and the reference's testDumper) covers:
//   convolutional (square / non-square / dilated / strided, opt. bias)
//   transposedconv (stride/pad/outpad), batchnorm, shortcut (partial-channel
//   add), concat, maxpool, avgpool, pixelshuffle, connected (FC), softmax,
//   relu activations.
//
// Exposed as a C ABI for ctypes (robocupvision_tpu/export/engine.py); layer
// outputs are retained for golden-vector parity tests against the JAX side.

#include <cmath>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Tensor {
  int c = 0, h = 0, w = 0;
  std::vector<float> data;  // NCHW, n==1
  void resize(int c_, int h_, int w_) {
    c = c_; h = h_; w = w_;
    data.assign(static_cast<size_t>(c) * h * w, 0.f);
  }
  float* at(int ci) { return data.data() + static_cast<size_t>(ci) * h * w; }
  const float* at(int ci) const {
    return data.data() + static_cast<size_t>(ci) * h * w;
  }
};

struct Section {
  std::string name;
  std::map<std::string, std::string> kv;
  int geti(const std::string& k, int d) const {
    auto it = kv.find(k);
    return it == kv.end() ? d : std::stoi(it->second);
  }
  std::string gets(const std::string& k, const std::string& d) const {
    auto it = kv.find(k);
    return it == kv.end() ? d : it->second;
  }
};

static std::string trim(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

static std::vector<Section> parse_cfg(const std::string& path) {
  std::ifstream f(path);
  std::vector<Section> out;
  std::string line;
  while (std::getline(f, line)) {
    line = trim(line);
    if (line.empty() || line[0] == '#' || line[0] == ';') continue;
    if (line.front() == '[' && line.back() == ']') {
      out.push_back({line.substr(1, line.size() - 2), {}});
    } else {
      auto eq = line.find('=');
      if (eq != std::string::npos && !out.empty()) {
        out.back().kv[trim(line.substr(0, eq))] = trim(line.substr(eq + 1));
      }
    }
  }
  return out;
}

// "3" -> (3,3); "3x1" -> (3,1)
static void parse_pair(const std::string& s, int* a, int* b) {
  auto x = s.find('x');
  if (x == std::string::npos) {
    *a = *b = std::stoi(s);
  } else {
    *a = std::stoi(s.substr(0, x));
    *b = std::stoi(s.substr(x + 1));
  }
}

class WeightReader {
 public:
  explicit WeightReader(const std::string& path) {
    std::ifstream f(path, std::ios::binary | std::ios::ate);
    if (!f) return;
    size_t bytes = static_cast<size_t>(f.tellg());
    f.seekg(0);
    data_.resize(bytes / sizeof(float));
    f.read(reinterpret_cast<char*>(data_.data()), data_.size() * sizeof(float));
    ok_ = true;
  }
  bool ok() const { return ok_; }
  const float* take(size_t n) {
    if (off_ + n > data_.size()) { overrun_ = true; return nullptr; }
    const float* p = data_.data() + off_;
    off_ += n;
    return p;
  }
  bool fully_consumed() const { return !overrun_ && off_ == data_.size(); }
  bool overrun() const { return overrun_; }

 private:
  std::vector<float> data_;
  size_t off_ = 0;
  bool ok_ = false, overrun_ = false;
};

enum class Act { kLinear, kRelu };

static Act parse_act(const std::string& s) {
  return s == "relu" ? Act::kRelu : Act::kLinear;
}

static void apply_act(Tensor* t, Act a) {
  if (a != Act::kRelu) return;
  for (auto& v : t->data) v = v > 0.f ? v : 0.f;
}

struct Layer {
  std::string kind;
  Act act = Act::kLinear;
  // conv / tconv
  int filters = 0, kh = 0, kw = 0, sh = 1, sw = 1, ph = 0, pw = 0;
  int dh = 1, dw = 1, outpad = 0;
  bool has_bias = false;
  bool gemm = false;  // dense conv fast path (im2col + register-blocked GEMM)
  std::vector<float> w, b;            // conv: OIHW; tconv: IOHW; fc: OI
  std::vector<float> wt;              // tconv gemm path: (o, ci*kh*kw)
  std::vector<float> bn_g, bn_b, bn_m, bn_v;
  int from = -1;                      // shortcut / concat source layer
  int pool_k = 2, pool_s = 2, ps_factor = 2, fc_out = 0;
};

class Engine {
 public:
  bool load(const std::string& cfg_path, const std::string& weights_path) {
    auto secs = parse_cfg(cfg_path);
    if (secs.empty() || secs[0].name != "net") return false;
    in_c_ = secs[0].geti("channels", 3);
    in_h_ = secs[0].geti("height", 120);
    in_w_ = secs[0].geti("width", 160);

    WeightReader wr(weights_path);
    if (!wr.ok()) return false;

    int c = in_c_;
    int h = in_h_, w = in_w_;  // nominal dims tracked for [connected] sizing
    std::vector<int> layer_channels;  // output channels per layer
    for (size_t i = 1; i < secs.size(); ++i) {
      const Section& s = secs[i];
      Layer L;
      L.kind = s.name;
      L.act = parse_act(s.gets("activation", "linear"));
      if (s.name == "convolutional") {
        L.filters = s.geti("filters", 0);
        parse_pair(s.gets("size", "1"), &L.kh, &L.kw);
        L.sh = L.sw = s.geti("stride", 1);
        parse_pair(s.gets("pad", "0"), &L.ph, &L.pw);
        parse_pair(s.gets("dilation", "1"), &L.dh, &L.dw);
        L.has_bias = s.geti("hasBias", 1) != 0;
        size_t n = static_cast<size_t>(L.filters) * c * L.kh * L.kw;
        const float* p = wr.take(n);
        if (!p) return false;
        L.w.assign(p, p + n);
        if (L.has_bias) {
          p = wr.take(L.filters);
          if (!p) return false;
          L.b.assign(p, p + L.filters);
        }
        // path choice, once, from static layer facts: the direct loop skips
        // zero weights (magnitude-pruned checkpoints cost ~nothing there),
        // so dense kernels with a deep enough reduction take the im2col+GEMM
        // path (measured ~6x at the deep flagship layers) and sparse or
        // skinny ones keep the skip-zero direct loop.
        {
          size_t zeros = 0;
          for (float v : L.w) zeros += (v == 0.f);
          double zero_frac = L.w.empty() ? 0.0
                             : static_cast<double>(zeros) / L.w.size();
          L.gemm = zero_frac < 0.4 && c * L.kh * L.kw >= 72;
        }
        c = L.filters;
        h = (h + 2 * L.ph - L.dh * (L.kh - 1) - 1) / L.sh + 1;
        w = (w + 2 * L.pw - L.dw * (L.kw - 1) - 1) / L.sw + 1;
      } else if (s.name == "transposedconv") {
        L.filters = s.geti("filters", 0);
        parse_pair(s.gets("size", "3"), &L.kh, &L.kw);
        L.sh = L.sw = s.geti("stride", 2);
        parse_pair(s.gets("pad", "1"), &L.ph, &L.pw);
        L.outpad = s.geti("outpad", 1);
        L.has_bias = s.geti("hasBias", 1) != 0;
        size_t n = static_cast<size_t>(c) * L.filters * L.kh * L.kw;
        const float* p = wr.take(n);
        if (!p) return false;
        L.w.assign(p, p + n);  // (in, out, kh, kw) — torch layout
        if (L.has_bias) {
          p = wr.take(L.filters);
          if (!p) return false;
          L.b.assign(p, p + L.filters);
        }
        // dense tconvs take the gather+GEMM path (same criteria as conv);
        // precompute the (o, ci*kh*kw) weight view the GEMM reads
        {
          size_t zeros = 0;
          for (float v : L.w) zeros += (v == 0.f);
          double zero_frac = L.w.empty() ? 0.0
                             : static_cast<double>(zeros) / L.w.size();
          L.gemm = zero_frac < 0.4 && c * L.kh * L.kw >= 72;
          if (L.gemm) {
            int kd = c * L.kh * L.kw;
            L.wt.assign(static_cast<size_t>(L.filters) * kd, 0.f);
            for (int ci = 0; ci < c; ++ci)
              for (int o = 0; o < L.filters; ++o)
                for (int t = 0; t < L.kh * L.kw; ++t)
                  L.wt[static_cast<size_t>(o) * kd + ci * L.kh * L.kw + t] =
                      L.w[(static_cast<size_t>(ci) * L.filters + o) *
                              L.kh * L.kw + t];
          }
        }
        c = L.filters;
        h = (h - 1) * L.sh - 2 * L.ph + L.kh + L.outpad;
        w = (w - 1) * L.sw - 2 * L.pw + L.kw + L.outpad;
      } else if (s.name == "batchnorm") {
        for (auto* v : {&L.bn_g, &L.bn_b, &L.bn_m, &L.bn_v}) {
          const float* p = wr.take(c);
          if (!p) return false;
          v->assign(p, p + c);
        }
      } else if (s.name == "shortcut" || s.name == "concat") {
        L.from = s.geti("from", -1);
        if (L.from < 0 ||
            L.from >= static_cast<int>(layer_channels.size()))
          return false;
        if (s.name == "concat") c += layer_channels[L.from];
      } else if (s.name == "maxpool" || s.name == "avgpool") {
        L.pool_k = s.geti("size", 2);
        L.pool_s = s.geti("stride", L.pool_k);
        h = (h - L.pool_k) / L.pool_s + 1;
        w = (w - L.pool_k) / L.pool_s + 1;
      } else if (s.name == "pixelshuffle") {
        L.ps_factor = s.geti("factor", 2);
        c = c / (L.ps_factor * L.ps_factor);
        h *= L.ps_factor;
        w *= L.ps_factor;
      } else if (s.name == "connected") {
        L.fc_out = s.geti("outputs", 0);
        // weight is (out, in); `inputs` defaults to the flattened c*h*w at
        // the cfg's nominal dims. forward() re-validates against the actual
        // input so a size mismatch fails cleanly instead of overreading.
        L.has_bias = true;
        int in_len = s.geti("inputs", c * h * w);
        if (L.fc_out <= 0 || in_len <= 0) return false;
        size_t n = static_cast<size_t>(L.fc_out) * in_len;
        const float* p = wr.take(n);
        if (!p) return false;
        L.w.assign(p, p + n);
        p = wr.take(L.fc_out);
        if (!p) return false;
        L.b.assign(p, p + L.fc_out);
        c = L.fc_out;
        h = 1;
        w = 1;
      } else if (s.name == "softmax") {
        // no params
      } else {
        std::fprintf(stderr, "robocup_engine: unknown section [%s]\n",
                     s.name.c_str());
        return false;
      }
      layer_channels.push_back(c);
      layers_.push_back(std::move(L));
    }
    if (wr.overrun()) return false;
    weights_fully_consumed_ = wr.fully_consumed();
    return true;
  }

  int input_size() const { return in_c_ * in_h_ * in_w_; }
  int in_c() const { return in_c_; }
  int in_h() const { return in_h_; }
  int in_w() const { return in_w_; }
  int layer_count() const { return static_cast<int>(layers_.size()); }
  bool weights_fully_consumed() const { return weights_fully_consumed_; }

  const Tensor& output(int i) const { return outs_[i]; }

  bool forward(const float* input, int h, int w) {
    Tensor x;
    x.resize(in_c_, h > 0 ? h : in_h_, w > 0 ? w : in_w_);
    std::memcpy(x.data.data(), input, x.data.size() * sizeof(float));
    outs_.clear();
    outs_.reserve(layers_.size());

    for (const Layer& L : layers_) {
      Tensor y;
      if (L.kind == "convolutional") {
        conv(x, L, &y);
      } else if (L.kind == "transposedconv") {
        tconv(x, L, &y);
      } else if (L.kind == "batchnorm") {
        y = x;
        const float eps = 1e-5f;
        for (int ci = 0; ci < y.c; ++ci) {
          float inv = 1.f / std::sqrt(L.bn_v[ci] + eps);
          float g = L.bn_g[ci] * inv;
          float bb = L.bn_b[ci] - L.bn_m[ci] * g;
          float* p = y.at(ci);
          for (int i = 0; i < y.h * y.w; ++i) p[i] = p[i] * g + bb;
        }
      } else if (L.kind == "shortcut") {
        y = x;
        const Tensor& o = outs_[L.from];
        int cmin = std::min(y.c, o.c);
        for (int ci = 0; ci < cmin; ++ci) {
          float* p = y.at(ci);
          const float* q = o.at(ci);
          for (int i = 0; i < y.h * y.w; ++i) p[i] += q[i];
        }
      } else if (L.kind == "concat") {
        const Tensor& o = outs_[L.from];
        y.resize(x.c + o.c, x.h, x.w);
        std::memcpy(y.data.data(), x.data.data(),
                    x.data.size() * sizeof(float));
        std::memcpy(y.data.data() + x.data.size(), o.data.data(),
                    o.data.size() * sizeof(float));
      } else if (L.kind == "maxpool" || L.kind == "avgpool") {
        pool(x, L, L.kind == "maxpool", &y);
      } else if (L.kind == "pixelshuffle") {
        pixel_shuffle(x, L.ps_factor, &y);
      } else if (L.kind == "connected") {
        int in_len = x.c * x.h * x.w;
        if (static_cast<size_t>(in_len) * L.fc_out != L.w.size()) {
          std::fprintf(stderr,
                       "robocup_engine: [connected] input %d != weights/%d\n",
                       in_len, L.fc_out);
          return false;
        }
        y.resize(L.fc_out, 1, 1);
        for (int o = 0; o < L.fc_out; ++o) {
          const float* wrow = L.w.data() + static_cast<size_t>(o) * in_len;
          float acc = L.b[o];
          for (int i = 0; i < in_len; ++i) acc += wrow[i] * x.data[i];
          y.data[o] = acc;
        }
      } else if (L.kind == "softmax") {
        y = x;
        for (int i = 0; i < y.h * y.w; ++i) {
          float mx = -1e30f;
          for (int ci = 0; ci < y.c; ++ci)
            mx = std::max(mx, y.at(ci)[i]);
          float sum = 0.f;
          for (int ci = 0; ci < y.c; ++ci) {
            float e = std::exp(y.at(ci)[i] - mx);
            y.at(ci)[i] = e;
            sum += e;
          }
          for (int ci = 0; ci < y.c; ++ci) y.at(ci)[i] /= sum;
        }
      } else {
        return false;
      }
      apply_act(&y, L.act);
      outs_.push_back(y);
      x = std::move(y);
    }
    return true;
  }

 private:
  void conv(const Tensor& x, const Layer& L, Tensor* y) {
    int oh = (x.h + 2 * L.ph - L.dh * (L.kh - 1) - 1) / L.sh + 1;
    int ow = (x.w + 2 * L.pw - L.dw * (L.kw - 1) - 1) / L.sw + 1;
    y->resize(L.filters, oh, ow);
    if (L.gemm) {
      conv_gemm(x, L, oh, ow, y);
      return;
    }
    for (int o = 0; o < L.filters; ++o) {
      float* dst = y->at(o);
      float bias = L.has_bias ? L.b[o] : 0.f;
      for (int i = 0; i < oh * ow; ++i) dst[i] = bias;
      for (int ci = 0; ci < x.c; ++ci) {
        const float* src = x.at(ci);
        const float* ker =
            L.w.data() + (static_cast<size_t>(o) * x.c + ci) * L.kh * L.kw;
        for (int ky = 0; ky < L.kh; ++ky) {
          for (int kx = 0; kx < L.kw; ++kx) {
            float wv = ker[ky * L.kw + kx];
            if (wv == 0.f) continue;  // pruned weights cost nothing
            int iy0 = -L.ph + ky * L.dh;
            int ix0 = -L.pw + kx * L.dw;
            for (int oy = 0; oy < oh; ++oy) {
              int iy = iy0 + oy * L.sh;
              if (iy < 0 || iy >= x.h) continue;
              const float* srow = src + iy * x.w;
              float* drow = dst + oy * ow;
              if (L.sw == 1) {
                // hoisted column bounds: a branch-free vectorizable body
                int lo = ix0 < 0 ? -ix0 : 0;
                int hi = ix0 + ow > x.w ? x.w - ix0 : ow;
                for (int ox = lo; ox < hi; ++ox)
                  drow[ox] += wv * srow[ix0 + ox];
              } else {
                for (int ox = 0; ox < ow; ++ox) {
                  int ix = ix0 + ox * L.sw;
                  if (ix < 0 || ix >= x.w) continue;
                  drow[ox] += wv * srow[ix];
                }
              }
            }
          }
        }
      }
    }
  }

  // y[o, :] = bias[o] + sum_k wmat[o, k] * col_[k, :], 4 output channels at
  // a time (shared by conv_gemm and tconv_gemm; conv's OIHW weights are
  // already (o, ci*kh*kw) row-major, tconv uses the precomputed wt view)
  void gemm4(const float* wmat, const Layer& L, int Kd, int N, Tensor* y) {
    for (int o0 = 0; o0 < L.filters; o0 += 4) {
      int ob = (o0 + 4 <= L.filters) ? 4 : L.filters - o0;
      float* d[4];
      for (int b = 0; b < ob; ++b) {
        d[b] = y->at(o0 + b);
        float bias = L.has_bias ? L.b[o0 + b] : 0.f;
        for (int i = 0; i < N; ++i) d[b][i] = bias;
      }
      for (int k = 0; k < Kd; ++k) {
        const float* col = col_.data() + static_cast<size_t>(k) * N;
        float wv[4];
        for (int b = 0; b < ob; ++b)
          wv[b] = wmat[static_cast<size_t>(o0 + b) * Kd + k];
        if (ob == 4) {
          float *d0 = d[0], *d1 = d[1], *d2 = d[2], *d3 = d[3];
          float w0 = wv[0], w1 = wv[1], w2 = wv[2], w3 = wv[3];
          for (int i = 0; i < N; ++i) {
            float cv = col[i];
            d0[i] += w0 * cv;
            d1[i] += w1 * cv;
            d2[i] += w2 * cv;
            d3[i] += w3 * cv;
          }
        } else {
          for (int b = 0; b < ob; ++b) {
            float* db = d[b];
            float wb = wv[b];
            for (int i = 0; i < N; ++i) db[i] += wb * col[i];
          }
        }
      }
    }
  }

  // im2col + register-blocked GEMM. Tap accumulation order (ci, ky, kx)
  // matches the direct loop's exactly, so both paths produce identical
  // floats (golden tests cover either). The col scratch persists across
  // layers/frames (col_).
  void conv_gemm(const Tensor& x, const Layer& L, int oh, int ow, Tensor* y) {
    const int N = oh * ow;
    const int Kd = x.c * L.kh * L.kw;
    col_.assign(static_cast<size_t>(Kd) * N, 0.f);
    const bool unit = (L.sh == 1 && L.sw == 1 && L.dh == 1 && L.dw == 1);
    for (int ci = 0; ci < x.c; ++ci) {
      const float* src = x.at(ci);
      for (int ky = 0; ky < L.kh; ++ky) {
        for (int kx = 0; kx < L.kw; ++kx) {
          float* dst =
              col_.data() +
              (static_cast<size_t>(ci) * L.kh * L.kw + ky * L.kw + kx) * N;
          int iy0 = -L.ph + ky * L.dh;
          int ix0 = -L.pw + kx * L.dw;
          for (int oy = 0; oy < oh; ++oy) {
            int iy = iy0 + oy * L.sh;
            if (iy < 0 || iy >= x.h) continue;
            const float* srow = src + iy * x.w;
            float* drow = dst + oy * ow;
            if (unit) {
              int lo = ix0 < 0 ? -ix0 : 0;
              int hi = ix0 + ow > x.w ? x.w - ix0 : ow;
              std::memcpy(drow + lo, srow + ix0 + lo,
                          static_cast<size_t>(hi - lo) * sizeof(float));
            } else {
              for (int ox = 0; ox < ow; ++ox) {
                int ix = ix0 + ox * L.sw;
                if (ix >= 0 && ix < x.w) drow[ox] = srow[ix];
              }
            }
          }
        }
      }
    }
    gemm4(L.w.data(), L, Kd, N, y);
  }

  void tconv(const Tensor& x, const Layer& L, Tensor* y) {
    int oh = (x.h - 1) * L.sh - 2 * L.ph + L.kh + L.outpad;
    int ow = (x.w - 1) * L.sw - 2 * L.pw + L.kw + L.outpad;
    y->resize(L.filters, oh, ow);
    if (L.gemm) {
      tconv_gemm(x, L, oh, ow, y);
      return;
    }
    for (int o = 0; o < L.filters; ++o) {
      float* dst = y->at(o);
      float bias = L.has_bias ? L.b[o] : 0.f;
      for (int i = 0; i < oh * ow; ++i) dst[i] = bias;
    }
    for (int ci = 0; ci < x.c; ++ci) {
      const float* src = x.at(ci);
      for (int o = 0; o < L.filters; ++o) {
        const float* ker =
            L.w.data() + (static_cast<size_t>(ci) * L.filters + o) * L.kh * L.kw;
        float* dst = y->at(o);
        for (int iy = 0; iy < x.h; ++iy) {
          for (int ix = 0; ix < x.w; ++ix) {
            float v = src[iy * x.w + ix];
            if (v == 0.f) continue;
            int oy0 = iy * L.sh - L.ph;
            int ox0 = ix * L.sw - L.pw;
            for (int ky = 0; ky < L.kh; ++ky) {
              int oy = oy0 + ky;
              if (oy < 0 || oy >= oh) continue;
              for (int kx = 0; kx < L.kw; ++kx) {
                int ox = ox0 + kx;
                if (ox < 0 || ox >= ow) continue;
                dst[oy * ow + ox] += v * ker[ky * L.kw + kx];
              }
            }
          }
        }
      }
    }
  }

  // transpose conv in GATHER form: col[(ci,ky,kx), (oy,ox)] = x[ci, iy, ix]
  // where iy = (oy + ph - ky) / sh, ix = (ox + pw - kx) / sw when divisible
  // and in range, else 0 — then the same register-blocked GEMM as conv_gemm
  // over the precomputed (o, ci*kh*kw) weight view. Per-output-element tap
  // order is (ci, ky, kx) vs the scatter path's input-pixel order — a float
  // reassociation within the golden tests' FMA tolerance.
  void tconv_gemm(const Tensor& x, const Layer& L, int oh, int ow, Tensor* y) {
    const int N = oh * ow;
    const int Kd = x.c * L.kh * L.kw;
    col_.assign(static_cast<size_t>(Kd) * N, 0.f);
    for (int ci = 0; ci < x.c; ++ci) {
      const float* src = x.at(ci);
      for (int ky = 0; ky < L.kh; ++ky) {
        for (int kx = 0; kx < L.kw; ++kx) {
          float* dst =
              col_.data() +
              (static_cast<size_t>(ci) * L.kh * L.kw + ky * L.kw + kx) * N;
          for (int oy = 0; oy < oh; ++oy) {
            int iy_num = oy + L.ph - ky;
            if (iy_num < 0 || iy_num % L.sh) continue;
            int iy = iy_num / L.sh;
            if (iy >= x.h) continue;
            const float* srow = src + iy * x.w;
            float* drow = dst + oy * ow;
            // valid ox form an arithmetic sequence with step sw
            int ox0 = kx - L.pw;              // where ix == 0
            int ox = ox0 < 0 ? ox0 + L.sw * ((-ox0 + L.sw - 1) / L.sw) : ox0;
            int ix = (ox + L.pw - kx) / L.sw;
            for (; ox < ow && ix < x.w; ox += L.sw, ++ix)
              drow[ox] = srow[ix];
          }
        }
      }
    }
    gemm4(L.wt.data(), L, Kd, N, y);
  }

  static void pool(const Tensor& x, const Layer& L, bool is_max, Tensor* y) {
    int oh = (x.h - L.pool_k) / L.pool_s + 1;
    int ow = (x.w - L.pool_k) / L.pool_s + 1;
    y->resize(x.c, oh, ow);
    for (int ci = 0; ci < x.c; ++ci) {
      const float* src = x.at(ci);
      float* dst = y->at(ci);
      for (int oy = 0; oy < oh; ++oy) {
        for (int ox = 0; ox < ow; ++ox) {
          float acc = is_max ? -1e30f : 0.f;
          for (int ky = 0; ky < L.pool_k; ++ky) {
            for (int kx = 0; kx < L.pool_k; ++kx) {
              float v = src[(oy * L.pool_s + ky) * x.w + ox * L.pool_s + kx];
              acc = is_max ? std::max(acc, v) : acc + v;
            }
          }
          dst[oy * ow + ox] = is_max ? acc : acc / (L.pool_k * L.pool_k);
        }
      }
    }
  }

  static void pixel_shuffle(const Tensor& x, int r, Tensor* y) {
    int oc = x.c / (r * r);
    y->resize(oc, x.h * r, x.w * r);
    for (int o = 0; o < oc; ++o) {
      for (int i = 0; i < r; ++i) {
        for (int j = 0; j < r; ++j) {
          const float* src = x.at(o * r * r + i * r + j);
          float* dst = y->at(o);
          for (int yy = 0; yy < x.h; ++yy) {
            for (int xx = 0; xx < x.w; ++xx) {
              dst[(yy * r + i) * (x.w * r) + xx * r + j] = src[yy * x.w + xx];
            }
          }
        }
      }
    }
  }

  int in_c_ = 0, in_h_ = 0, in_w_ = 0;
  bool weights_fully_consumed_ = false;
  std::vector<Layer> layers_;
  std::vector<Tensor> outs_;
  std::vector<float> col_;  // im2col scratch, reused across layers/frames
};

}  // namespace

extern "C" {

void* rcv_engine_create(const char* cfg_path, const char* weights_path) {
  auto* e = new Engine();
  if (!e->load(cfg_path, weights_path)) {
    delete e;
    return nullptr;
  }
  return e;
}

void rcv_engine_destroy(void* h) { delete static_cast<Engine*>(h); }

int rcv_engine_input_size(void* h) {
  return static_cast<Engine*>(h)->input_size();
}

int rcv_engine_layer_count(void* h) {
  return static_cast<Engine*>(h)->layer_count();
}

int rcv_engine_weights_fully_consumed(void* h) {
  return static_cast<Engine*>(h)->weights_fully_consumed() ? 1 : 0;
}

// Runs a forward pass on a (channels, ih, iw) input (ih/iw <= 0 use the cfg
// dims; the nets are fully convolutional). Returns the float count of the
// final output, or -1 on failure.
int rcv_engine_forward(void* h, const float* input, int ih, int iw) {
  auto* e = static_cast<Engine*>(h);
  if (!e->forward(input, ih, iw)) return -1;
  const Tensor& out = e->output(e->layer_count() - 1);
  return static_cast<int>(out.data.size());
}

// Copies layer i's output (after a forward) into buf; returns float count
// actually needed, writing min(capacity, needed) floats. dims receives c,h,w.
int rcv_engine_layer_output(void* h, int i, float* buf, int capacity,
                            int* dims) {
  auto* e = static_cast<Engine*>(h);
  if (i < 0 || i >= e->layer_count()) return -1;
  const Tensor& t = e->output(i);
  if (dims) { dims[0] = t.c; dims[1] = t.h; dims[2] = t.w; }
  int n = static_cast<int>(t.data.size());
  int m = n < capacity ? n : capacity;
  std::memcpy(buf, t.data.data(), static_cast<size_t>(m) * sizeof(float));
  return n;
}

}  // extern "C"
