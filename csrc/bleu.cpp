// BLEU-1..4 scorer — C++ fast path for metrics/bleu.py.
//
// Bit-parity contract: integer n-gram statistics are exact; the float
// chain (tiny/small epsilon ratios, bleu**(1/(k+1)), brevity penalty
// exp(1 - 1/ratio), effective-reflen accumulation) runs in the same
// operation order with the same libm pow/exp as the Python scorer, so both
// per-image and corpus scores are bit-equal. The "closest" effective
// reference length reproduces Python's tuple-min semantics exactly
// (lexicographic on (abs(l - testlen), l)).
//
// API (ctypes):
//   bleu_score(cands, n_images, refs_flat, refs_per_image, n_order,
//              option /*0 closest, 1 average, 2 shortest*/,
//              out_corpus[n_order], out_per_image[n_order * n_images]) -> int

#include <cmath>
#include <cstdint>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double TINY = 1e-15;
constexpr double SMALL = 1e-9;

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

// n-gram -> count over interned-token packed keys
using CountMap = std::unordered_map<std::string, int>;

int precook(const char* sentence, int n, Interner& intern, CountMap& counts) {
  auto raw = split_ws(sentence);
  std::vector<uint32_t> words;
  words.reserve(raw.size());
  for (auto& w : raw) words.push_back(intern.get(w));
  for (int k = 1; k <= n; ++k)
    for (int i = 0; i + k <= (int)words.size(); ++i) {
      std::string key((const char*)&words[i], k * sizeof(uint32_t));
      counts[std::move(key)] += 1;
    }
  return (int)words.size();
}

}  // namespace

extern "C" {

int bleu_score(const char** cands, int n_images, const char** refs_flat,
               const int* refs_per_image, int n_order, int option,
               double* out_corpus, double* out_per_image) {
  const int n = n_order;
  Interner intern;
  long long total_testlen = 0;
  double total_reflen = 0.0;
  std::vector<long long> total_guess(n, 0), total_correct(n, 0);
  int rpos = 0;

  for (int i = 0; i < n_images; ++i) {
    // cook refs: per-ngram max count + reference lengths
    std::vector<int> reflens;
    CountMap maxcounts;
    for (int j = 0; j < refs_per_image[i]; ++j) {
      CountMap counts;
      reflens.push_back(precook(refs_flat[rpos++], n, intern, counts));
      for (auto& kv : counts) {
        auto it = maxcounts.find(kv.first);
        if (it == maxcounts.end())
          maxcounts.emplace(kv.first, kv.second);
        else if (kv.second > it->second)
          it->second = kv.second;
      }
    }
    // cook test
    CountMap counts;
    int testlen = precook(cands[i], n, intern, counts);
    std::vector<long long> guess(n), correct(n, 0);
    for (int k = 0; k < n; ++k)
      guess[k] = testlen - k >= 0 ? testlen - k : 0;
    for (auto& kv : counts) {
      int k = (int)(kv.first.size() / sizeof(uint32_t)) - 1;
      auto it = maxcounts.find(kv.first);
      int m = it == maxcounts.end() ? 0 : it->second;
      correct[k] += m < kv.second ? m : kv.second;
    }
    // effective reference length
    double reflen;
    if (option == 2) {  // shortest
      int best = reflens[0];
      for (int l : reflens)
        if (l < best) best = l;
      reflen = (double)best;
    } else if (option == 1) {  // average — Python float(sum)/len
      long long s = 0;
      for (int l : reflens) s += l;
      reflen = (double)s / (double)reflens.size();
    } else {  // closest — Python min over (abs(l-testlen), l) tuples
      long long babs = -1;
      int bl = 0;
      for (int l : reflens) {
        long long a = l > testlen ? l - testlen : testlen - l;
        if (babs < 0 || a < babs || (a == babs && l < bl)) {
          babs = a;
          bl = l;
        }
      }
      reflen = (double)bl;
    }

    total_testlen += testlen;
    total_reflen += reflen;
    for (int k = 0; k < n; ++k) {
      total_guess[k] += guess[k];
      total_correct[k] += correct[k];
    }
    // per-image scores
    double bleu = 1.0;
    double ratio = ((double)testlen + TINY) / (reflen + SMALL);
    for (int k = 0; k < n; ++k) {
      bleu *= ((double)correct[k] + TINY) / ((double)guess[k] + SMALL);
      double v = std::pow(bleu, 1.0 / (double)(k + 1));
      if (ratio < 1.0) v *= std::exp(1.0 - 1.0 / ratio);
      out_per_image[(size_t)k * n_images + i] = v;
    }
  }

  double bleu = 1.0;
  double ratio = ((double)total_testlen + TINY) / (total_reflen + SMALL);
  for (int k = 0; k < n; ++k) {
    bleu *= ((double)total_correct[k] + TINY) / ((double)total_guess[k] + SMALL);
    double v = std::pow(bleu, 1.0 / (double)(k + 1));
    if (ratio < 1.0) v *= std::exp(1.0 - 1.0 / ratio);
    out_corpus[k] = v;
  }
  return 0;
}

}  // extern "C"
