// CIDEr scorer — C++ fast path for metrics/cider.py.
//
// Bit-parity contract: the Python scorer does all float math with IEEE
// doubles in a fixed order (dict insertion order = n-gram order k=1..4
// outer, sentence position inner, first occurrence). This port reproduces
// the same operations in the same order with the same libm (log/pow/sqrt),
// so per-image accumulated score vectors are bit-equal to the Python path
// (differential-tested in tests/test_native.py). The numpy aggregation
// (mean over the 4 orders, /nrefs, *10, corpus mean) stays in Python.
//
// API (ctypes):
//   cider_score(cands, n_images, refs_flat, refs_per_image,
//               n_order, sigma, out[n_images * n_order]) -> int (0 ok)
// Sentences are '\0'-terminated UTF-8; tokens split on ASCII whitespace
// (the Python wrapper pre-normalizes Unicode whitespace like the METEOR
// wrapper does).

#include <cmath>
#include <cstdint>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

// CPython's float ** computes via libm pow(); gcc -O2 folds std::pow(x, 2.0)
// into x*x (1-ulp different for ~0.07% of doubles), so route through a
// volatile function pointer the compiler cannot see through.
double (*volatile real_pow)(double, double) = &std::pow;

std::vector<std::string> split_ws(const char* s) {
  std::vector<std::string> out;
  const char* p = s;
  auto ws = [](char c) {
    return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
           c == '\v';
  };
  while (*p) {
    while (*p && ws(*p)) ++p;
    const char* q = p;
    while (*q && !ws(*q)) ++q;
    if (q > p) out.emplace_back(p, q - p);
    p = q;
  }
  return out;
}

// n-gram counts in Python-dict insertion order: k outer (1..n), position
// inner, first occurrence wins the slot
struct Counts {
  std::vector<std::string> keys;  // insertion-ordered n-gram keys
  std::vector<int> order;         // len(ngram) - 1 per key
  std::vector<int> tf;
  std::unordered_map<std::string, int> index;  // key -> slot
};

// global token intern table: n-gram keys become packed uint32 id strings
// (4 bytes per token), which hash ~3x faster than joined word strings
struct Interner {
  std::unordered_map<std::string, uint32_t> ids;
  uint32_t get(const std::string& w) {
    auto it = ids.find(w);
    if (it != ids.end()) return it->second;
    uint32_t id = (uint32_t)ids.size();
    ids.emplace(w, id);
    return id;
  }
};

Counts precook(const char* sentence, int n, Interner& intern) {
  Counts c;
  auto raw = split_ws(sentence);
  std::vector<uint32_t> words;
  words.reserve(raw.size());
  for (auto& w : raw) words.push_back(intern.get(w));
  for (int k = 1; k <= n; ++k) {
    for (int i = 0; i + k <= (int)words.size(); ++i) {
      std::string key((const char*)&words[i], k * sizeof(uint32_t));
      auto it = c.index.find(key);
      if (it == c.index.end()) {
        c.index.emplace(key, (int)c.keys.size());
        c.keys.push_back(std::move(key));
        c.order.push_back(k - 1);
        c.tf.push_back(1);
      } else {
        c.tf[it->second] += 1;
      }
    }
  }
  return c;
}

// tf-idf vector in the same slot order as its Counts
struct Vec {
  std::vector<double> weight;  // tf * (ref_len - log df), per slot
  std::unordered_map<std::string, int> index;  // ngram -> slot
  std::vector<double> norm;    // per order k, sqrt of sum of squares
  long long length = 0;        // bigram count (faithful reference quirk)
};

Vec counts2vec(const Counts& c,
               const std::unordered_map<std::string, double>& df,
               double ref_len, int n, bool build_index) {
  Vec v;
  std::vector<double> norm(n, 0.0);
  v.weight.reserve(c.keys.size());
  for (size_t i = 0; i < c.keys.size(); ++i) {
    auto it = df.find(c.keys[i]);
    double d = it == df.end() ? 0.0 : it->second;
    double logdf = std::log(d > 1.0 ? d : 1.0);
    int k = c.order[i];
    double w = (double)c.tf[i] * (ref_len - logdf);
    v.weight.push_back(w);
    if (build_index) v.index.emplace(c.keys[i], (int)i);
    // Python: norm[k] += vec[k][ngram] ** 2  (libm pow, NOT w*w)
    norm[k] += real_pow(w, 2.0);
    if (k == 1) v.length += c.tf[i];
  }
  v.norm.resize(n);
  for (int k = 0; k < n; ++k) v.norm[k] = std::sqrt(norm[k]);
  return v;
}

}  // namespace

extern "C" {

int cider_score(const char** cands, int n_images, const char** refs_flat,
                const int* refs_per_image, int n_order, double sigma,
                double* out) {
  const int n = n_order;
  Interner intern;
  std::vector<Counts> ctest;
  std::vector<std::vector<Counts>> crefs;
  ctest.reserve(n_images);
  crefs.reserve(n_images);
  int rpos = 0;
  for (int i = 0; i < n_images; ++i) {
    ctest.push_back(precook(cands[i], n, intern));
    std::vector<Counts> refs;
    refs.reserve(refs_per_image[i]);
    for (int j = 0; j < refs_per_image[i]; ++j)
      refs.push_back(precook(refs_flat[rpos++], n, intern));
    crefs.push_back(std::move(refs));
  }

  // document frequency: one increment per image whose reference SET
  // contains the n-gram (cider_scorer.py:93-103)
  std::unordered_map<std::string, double> df;
  for (auto& refs : crefs) {
    std::unordered_set<std::string> seen;
    for (auto& ref : refs)
      for (auto& key : ref.keys) seen.insert(key);
    for (auto& key : seen) df[key] += 1.0;
  }
  double ref_len = std::log((double)n_images);

  for (int i = 0; i < n_images; ++i) {
    Vec vh = counts2vec(ctest[i], df, ref_len, n, false);
    double* score = out + (size_t)i * n;
    for (int k = 0; k < n; ++k) score[k] = 0.0;
    for (auto& refc : crefs[i]) {
      Vec vr = counts2vec(refc, df, ref_len, n, true);
      double delta = (double)(vh.length - vr.length);
      // Python: np.e ** (-(delta ** 2) / (2 * sigma ** 2)). delta is
      // integer-valued so delta**2 == delta*delta exactly; sigma**2 must be
      // libm pow, and the denominator groups as 2 * (sigma ** 2).
      double penalty = real_pow(
          M_E, -(delta * delta) / (2.0 * real_pow(sigma, 2.0)));
      const auto& hkeys = ctest[i].keys;
      // iterate hyp n-grams k-major, within k in insertion order — exactly
      // Python's `for ngram in vh[k]` (the vec[k] dicts fill in global
      // insertion order), so the double additions happen in the same order
      for (int k = 0; k < n; ++k) {
        double val = 0.0;
        for (size_t e = 0; e < hkeys.size(); ++e) {
          if (ctest[i].order[e] != k) continue;
          double hw = vh.weight[e];
          auto it = vr.index.find(hkeys[e]);
          double rw = it == vr.index.end() ? 0.0 : vr.weight[it->second];
          val += (hw < rw ? hw : rw) * rw;
        }
        if (vh.norm[k] != 0.0 && vr.norm[k] != 0.0)
          val /= vh.norm[k] * vr.norm[k];
        if (std::isnan(val)) return 1;
        val *= penalty;
        score[k] += val;
      }
    }
  }
  return 0;
}

}  // extern "C"
