// ROUGE-L scorer — C++ fast path for metrics/rouge.py.
//
// Bit-parity contract: same float operations in the same order as the
// Python scorer (lcs/len divisions, max over refs, F-beta with
// pow(1.2, 2.0) from the same libm). Token quirk reproduced exactly:
// Python splits on SINGLE SPACES (str.split(" ")), so consecutive spaces
// and empty strings yield empty tokens that participate in the LCS.
//
// API (ctypes): rouge_score(cands, n_images, refs_flat, refs_per_image,
//                           beta, out[n_images]) -> int (0 ok)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// see csrc/cider.cpp: gcc folds std::pow(x, 2.0) into x*x; Python's
// beta ** 2 is libm pow
double (*volatile real_pow)(double, double) = &std::pow;

// split on single ' ' keeping empty fields — exact str.split(" ") semantics
std::vector<uint32_t> split_single_space(
    const char* s, std::unordered_map<std::string, uint32_t>& intern) {
  std::vector<uint32_t> out;
  std::string cur;
  auto flush = [&]() {
    auto it = intern.find(cur);
    uint32_t id;
    if (it == intern.end()) {
      id = (uint32_t)intern.size();
      intern.emplace(cur, id);
    } else {
      id = it->second;
    }
    out.push_back(id);
    cur.clear();
  };
  for (const char* p = s; *p; ++p) {
    if (*p == ' ')
      flush();
    else
      cur.push_back(*p);
  }
  flush();  // final field (Python split(" ") always yields >= 1 field)
  return out;
}

int lcs_length(const std::vector<uint32_t>& a, const std::vector<uint32_t>& b) {
  const std::vector<uint32_t>* pa = &a;
  const std::vector<uint32_t>* pb = &b;
  if (pa->size() < pb->size()) std::swap(pa, pb);
  std::vector<int> prev(pb->size() + 1, 0), cur(pb->size() + 1, 0);
  for (uint32_t x : *pa) {
    // every cur[j>=1] is overwritten and cur[0] stays 0: one swap per row,
    // no copies (the copy-twice form doubled the DP's memory traffic)
    cur[0] = 0;
    for (size_t j = 1; j <= pb->size(); ++j) {
      if (x == (*pb)[j - 1])
        cur[j] = prev[j - 1] + 1;
      else
        cur[j] = prev[j] > cur[j - 1] ? prev[j] : cur[j - 1];
    }
    std::swap(prev, cur);
  }
  return prev[pb->size()];
}

}  // namespace

extern "C" {

int rouge_score(const char** cands, int n_images, const char** refs_flat,
                const int* refs_per_image, double beta, double* out) {
  std::unordered_map<std::string, uint32_t> intern;
  double beta2 = real_pow(beta, 2.0);  // Python's self.beta ** 2 (same libm)
  int rpos = 0;
  for (int i = 0; i < n_images; ++i) {
    auto token_c = split_single_space(cands[i], intern);
    double prec_max = 0.0, rec_max = 0.0;
    bool first = true;
    for (int j = 0; j < refs_per_image[i]; ++j) {
      auto token_r = split_single_space(refs_flat[rpos++], intern);
      double lcs = (double)lcs_length(token_r, token_c);
      double p = lcs / (double)token_c.size();
      double r = lcs / (double)token_r.size();
      // max() over the collected lists == running max (same comparisons)
      if (first || p > prec_max) prec_max = p;
      if (first || r > rec_max) rec_max = r;
      first = false;
    }
    if (prec_max != 0.0 && rec_max != 0.0)
      out[i] = ((1.0 + beta2) * prec_max * rec_max) /
               (rec_max + beta2 * prec_max);
    else
      out[i] = 0.0;
  }
  return 0;
}

}  // extern "C"
