// METEOR scorer — C++ fast path.
//
// The reference drives meteor-1.5.jar through a persistent JVM subprocess
// and a stdio line protocol guarded by a lock
// (pycocoevalcap/meteor/meteor.py:18-56). This library is a native port of
// the framework's METEOR implementation (show_and_tell_tpu/metrics/meteor.py
// — exact + Porter-stem + synonym modules, METEOR 1.5 English parameters,
// unconditional fragmentation penalty), exposed via a C ABI for ctypes.
// The synonym table is injected once via meteor_set_synonyms() so Python
// and C++ share metrics/synonyms.py verbatim. tests/test_native.py asserts
// bit-equality with the Python reference implementation.
//
// Build: make -C csrc   (produces libmeteor.so)

#include <algorithm>
#include <cmath>
#include <cstdlib>
#include <cstring>
#include <set>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double ALPHA = 0.85;
constexpr double BETA = 2.15;
constexpr double GAMMA = 0.45;
constexpr double DELTA = 0.75;
constexpr double W_EXACT = 1.0;
constexpr double W_STEM = 0.6;
constexpr double W_SYN = 0.8;
constexpr double W_PARA = 0.6;
constexpr int MAX_PHRASE_LEN = 4;  // metrics/paraphrases.py MAX_PHRASE_LEN

// word -> sorted group ids; populated by meteor_set_synonyms().
std::unordered_map<std::string, std::vector<int>>& synonym_index() {
  static std::unordered_map<std::string, std::vector<int>> idx;
  return idx;
}

// phrase -> sorted group ids; populated by meteor_set_paraphrases().
std::unordered_map<std::string, std::vector<int>>& paraphrase_index() {
  static std::unordered_map<std::string, std::vector<int>> idx;
  return idx;
}

bool share_group(const std::vector<int>* a, const std::vector<int>* b) {
  if (a == nullptr || b == nullptr) return false;
  size_t i = 0, j = 0;
  while (i < a->size() && j < b->size()) {
    if ((*a)[i] == (*b)[j]) return true;
    if ((*a)[i] < (*b)[j]) ++i; else ++j;
  }
  return false;
}

const std::set<std::string>& function_words() {
  static const std::set<std::string> fw = {
      "a", "an", "the", "this", "that", "these", "those", "some", "any",
      "each", "every", "no", "all", "both", "half", "i", "you", "he", "she",
      "it", "we", "they", "me", "him", "her", "us", "them", "my", "your",
      "his", "its", "our", "their", "mine", "yours", "hers", "ours",
      "theirs", "myself", "yourself", "himself", "herself", "itself",
      "ourselves", "themselves", "who", "whom", "whose", "which", "what",
      "and", "or", "but", "nor", "so", "yet", "for", "if", "while",
      "although", "though", "because", "since", "unless", "until", "when",
      "where", "as", "than", "whether", "in", "on", "at", "by", "with",
      "from", "to", "of", "off", "over", "under", "above", "below",
      "between", "among", "through", "during", "before", "after", "about",
      "against", "into", "onto", "upon", "out", "up", "down", "is", "am",
      "are", "was", "were", "be", "been", "being", "do", "does", "did",
      "have", "has", "had", "will", "would", "shall", "should", "may",
      "might", "can", "could", "must", "not", "n't", "'s", "'m", "'re",
      "'ve", "'ll", "'d", "there", "here", "now", "then", "also", "just",
      "only", "very", "too", "quite", "rather"};
  return fw;
}

// --- Porter stemmer (faithful port of metrics/meteor.py) -------------------

bool is_cons(const std::string& w, size_t i) {
  char ch = w[i];
  if (ch == 'a' || ch == 'e' || ch == 'i' || ch == 'o' || ch == 'u') return false;
  if (ch == 'y') return i == 0 || !is_cons(w, i - 1);
  return true;
}

int measure(const std::string& stem) {
  int m = 0;
  char prev = 0;
  for (size_t i = 0; i < stem.size(); ++i) {
    char cur = is_cons(stem, i) ? 'c' : 'v';
    if (prev == 'v' && cur == 'c') ++m;
    prev = cur;
  }
  return m;
}

bool has_vowel(const std::string& stem) {
  for (size_t i = 0; i < stem.size(); ++i)
    if (!is_cons(stem, i)) return true;
  return false;
}

bool ends_double_cons(const std::string& w) {
  size_t n = w.size();
  return n >= 2 && w[n - 1] == w[n - 2] && is_cons(w, n - 1);
}

bool cvc(const std::string& w) {
  size_t n = w.size();
  if (n < 3) return false;
  if (!(is_cons(w, n - 3) && !is_cons(w, n - 2) && is_cons(w, n - 1))) return false;
  char last = w[n - 1];
  return last != 'w' && last != 'x' && last != 'y';
}

bool ends_with(const std::string& w, const std::string& suf) {
  return w.size() >= suf.size() &&
         w.compare(w.size() - suf.size(), suf.size(), suf) == 0;
}

std::string chop(const std::string& w, size_t n) { return w.substr(0, w.size() - n); }

std::string porter_stem(const std::string& word) {
  if (word.size() <= 2) return word;
  std::string w = word;

  // Step 1a
  if (ends_with(w, "sses")) w = chop(w, 2);
  else if (ends_with(w, "ies")) w = chop(w, 2);
  else if (ends_with(w, "ss")) {}
  else if (ends_with(w, "s")) w = chop(w, 1);

  // Step 1b
  bool flag = false;
  if (ends_with(w, "eed")) {
    if (measure(chop(w, 3)) > 0) w = chop(w, 1);
  } else if (ends_with(w, "ed") && has_vowel(chop(w, 2))) {
    w = chop(w, 2);
    flag = true;
  } else if (ends_with(w, "ing") && has_vowel(chop(w, 3))) {
    w = chop(w, 3);
    flag = true;
  }
  if (flag) {
    if (ends_with(w, "at") || ends_with(w, "bl") || ends_with(w, "iz")) w += "e";
    else if (ends_double_cons(w) && !ends_with(w, "l") && !ends_with(w, "s") &&
             !ends_with(w, "z"))
      w = chop(w, 1);
    else if (measure(w) == 1 && cvc(w)) w += "e";
  }

  // Step 1c
  if (ends_with(w, "y") && has_vowel(chop(w, 1))) w = chop(w, 1) + "i";

  // Step 2
  {
    static const std::vector<std::pair<std::string, std::string>> step2 = {
        {"ational", "ate"}, {"tional", "tion"}, {"enci", "ence"},
        {"anci", "ance"},   {"izer", "ize"},    {"abli", "able"},
        {"alli", "al"},     {"entli", "ent"},   {"eli", "e"},
        {"ousli", "ous"},   {"ization", "ize"}, {"ation", "ate"},
        {"ator", "ate"},    {"alism", "al"},    {"iveness", "ive"},
        {"fulness", "ful"}, {"ousness", "ous"}, {"aliti", "al"},
        {"iviti", "ive"},   {"biliti", "ble"}};
    for (const auto& p : step2) {
      if (ends_with(w, p.first)) {
        if (measure(chop(w, p.first.size())) > 0)
          w = chop(w, p.first.size()) + p.second;
        break;
      }
    }
  }

  // Step 3
  {
    static const std::vector<std::pair<std::string, std::string>> step3 = {
        {"icate", "ic"}, {"ative", ""}, {"alize", "al"}, {"iciti", "ic"},
        {"ical", "ic"},  {"ful", ""},   {"ness", ""}};
    for (const auto& p : step3) {
      if (ends_with(w, p.first)) {
        if (measure(chop(w, p.first.size())) > 0)
          w = chop(w, p.first.size()) + p.second;
        break;
      }
    }
  }

  // Step 4 (incl. the for/else "ion" clause of the Python reference)
  {
    static const std::vector<std::string> step4 = {
        "al",   "ance", "ence", "er",  "ic",  "able", "ible", "ant", "ement",
        "ment", "ent",  "ou",   "ism", "ate", "iti",  "ous",  "ive", "ize"};
    bool matched = false;
    for (const auto& suf : step4) {
      if (ends_with(w, suf)) {
        std::string stem = chop(w, suf.size());
        if (measure(stem) > 1) w = stem;
        matched = true;
        break;
      }
    }
    if (!matched) {
      if (ends_with(w, "ion") && w.size() > 3 &&
          (w[w.size() - 4] == 's' || w[w.size() - 4] == 't') &&
          measure(chop(w, 3)) > 1)
        w = chop(w, 3);
    }
  }

  // Step 5a
  if (ends_with(w, "e")) {
    std::string stem = chop(w, 1);
    int m = measure(stem);
    if (m > 1 || (m == 1 && !cvc(stem))) w = stem;
  }
  // Step 5b
  if (measure(w) > 1 && ends_double_cons(w) && ends_with(w, "l")) w = chop(w, 1);
  return w;
}

// --- alignment + sentence score -------------------------------------------

// Matches Python str.split(): ANY whitespace run separates tokens (the
// scorer's bit-equality contract with metrics/meteor.py depends on this —
// space-only splitting scored tab/newline-joined tokens as unmatched).
static inline bool is_ws(char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\v';
}

std::vector<std::string> split_ws(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    while (i < s.size() && is_ws(s[i])) ++i;
    size_t j = i;
    while (j < s.size() && !is_ws(s[j])) ++j;
    if (j > i) out.push_back(s.substr(i, j - i));
    i = j;
  }
  return out;
}

double word_weight(const std::string& w) {
  return function_words().count(w) ? 1.0 - DELTA : DELTA;
}

// A match is a span pair: hyp[i:i+il] aligned to ref[j:j+jl] by a module
// of weight w. Word-module matches have il == jl == 1; only the
// paraphrase module produces longer spans. Mirrors meteor.py Match.
struct Match {
  int i, il, j, jl;
  double w;
};

constexpr int RESOLVE_BEAM = 40;        // METEOR 1.5 Aligner beam width
constexpr size_t MAX_REF_RESOLVE = 128; // bitmask width; greedy beyond

// (start, length, group-ids) for every table phrase occurring in words.
// Mirrors meteor.py _phrase_spans.
struct PhraseSpan {
  int start, len;
  const std::vector<int>* groups;
};

std::vector<PhraseSpan> phrase_spans(const std::vector<std::string>& words) {
  const auto& idx = paraphrase_index();
  std::vector<PhraseSpan> out;
  if (idx.empty()) return out;
  int n = (int)words.size();
  for (int start = 0; start < n; ++start) {
    std::string phrase;
    int max_len = std::min(MAX_PHRASE_LEN, n - start);
    for (int len = 1; len <= max_len; ++len) {
      if (len > 1) phrase += ' ';
      phrase += words[start + len - 1];
      auto it = idx.find(phrase);
      if (it != idx.end()) out.push_back({start, len, &it->second});
    }
  }
  return out;
}

// Candidates per hyp start position, every module proposing over the whole
// pair simultaneously; word pairs carry the first supporting word-module's
// weight (exact, stem, synonym); the paraphrase module proposes span pairs
// sharing a paraphrase group (word-word pairs a word module already
// proposes are not duplicated). Rows sorted by (il, j, jl, -w).
// Mirrors meteor.py _candidate_spans.
std::vector<std::vector<Match>> candidate_spans(
    const std::vector<std::string>& hyp, const std::vector<std::string>& ref) {
  std::vector<std::string> hyp_stem(hyp.size()), ref_stem(ref.size());
  for (size_t i = 0; i < hyp.size(); ++i) hyp_stem[i] = porter_stem(hyp[i]);
  for (size_t j = 0; j < ref.size(); ++j) ref_stem[j] = porter_stem(ref[j]);
  // groups for surface form unioned with Porter stem (morphological
  // fallback, mirrors metrics/meteor.py _syn_groups)
  auto lookup_groups = [](const std::string& w,
                          const std::string& stem) -> std::vector<int> {
    const auto& syn = synonym_index();
    std::vector<int> out;
    auto it = syn.find(w);
    if (it != syn.end()) out = it->second;
    auto it2 = syn.find(stem);
    if (it2 != syn.end()) {
      std::vector<int> merged;
      std::set_union(out.begin(), out.end(), it2->second.begin(),
                     it2->second.end(), std::back_inserter(merged));
      out = std::move(merged);
    }
    return out;
  };
  std::vector<std::vector<int>> hyp_syn(hyp.size()), ref_syn(ref.size());
  for (size_t i = 0; i < hyp.size(); ++i)
    hyp_syn[i] = lookup_groups(hyp[i], hyp_stem[i]);
  for (size_t j = 0; j < ref.size(); ++j)
    ref_syn[j] = lookup_groups(ref[j], ref_stem[j]);

  std::vector<std::vector<Match>> cand(hyp.size());
  std::vector<std::vector<bool>> word_pair(
      hyp.size(), std::vector<bool>(ref.size(), false));
  for (size_t i = 0; i < hyp.size(); ++i) {
    for (size_t j = 0; j < ref.size(); ++j) {
      double w;
      if (hyp[i] == ref[j]) w = W_EXACT;
      else if (hyp_stem[i] == ref_stem[j]) w = W_STEM;
      else if (share_group(&hyp_syn[i], &ref_syn[j])) w = W_SYN;
      else continue;
      cand[i].push_back({(int)i, 1, (int)j, 1, w});
      word_pair[i][j] = true;
    }
  }
  auto hyp_spans = phrase_spans(hyp);
  auto ref_sp = phrase_spans(ref);
  for (const auto& hs : hyp_spans) {
    for (const auto& rs : ref_sp) {
      if (!share_group(hs.groups, rs.groups)) continue;
      if (hs.len == 1 && rs.len == 1 && word_pair[hs.start][rs.start])
        continue;  // a higher-priority word module owns this pair
      cand[hs.start].push_back({hs.start, hs.len, rs.start, rs.len, W_PARA});
    }
  }
  for (auto& row : cand) {
    std::stable_sort(row.begin(), row.end(), [](const Match& a, const Match& b) {
      if (a.il != b.il) return a.il < b.il;
      if (a.j != b.j) return a.j < b.j;
      if (a.jl != b.jl) return a.jl < b.jl;
      return a.w > b.w;
    });
  }
  return cand;
}

struct RState {
  int cov, c, d;
  double ws;
  unsigned __int128 mask;
  int cont_j;
  std::vector<Match> ml;
};

// METEOR 1.3/1.5 alignment resolution (Denkowski & Lavie 2011 s2.1): beam
// search over the pooled candidates of all four modules for the
// non-overlapping alignment maximizing covered words (both sentences),
// then minimizing chunks, then summed |start_i-start_j| distance (total
// weight as final deterministic tie-break). Bit-equal mirror of meteor.py
// _align: same generation order, same dedup rule, stable sorts. States
// advance over hyp positions (a span match advances by its hyp length);
// cont_j = ref index following the previous match's span IF that match
// ended exactly at this hyp position, else -1.
std::vector<Match> resolve_alignment(size_t hyp_len,
                                     const std::vector<std::vector<Match>>& cand) {
  size_t n = hyp_len;
  std::vector<std::vector<RState>> buckets(n + 1);
  buckets[0].push_back({0, 0, 0, 0.0, 0, -1, {}});
  for (size_t i = 0; i <= n; ++i) {
    auto& raw = buckets[i];
    // best per (mask, cont_j): stable-sort by key then objective, keep first
    std::stable_sort(raw.begin(), raw.end(), [](const RState& a, const RState& b) {
      if (a.mask != b.mask) return a.mask < b.mask;
      if (a.cont_j != b.cont_j) return a.cont_j < b.cont_j;
      if (a.cov != b.cov) return a.cov > b.cov;
      if (a.c != b.c) return a.c < b.c;
      if (a.d != b.d) return a.d < b.d;
      return a.ws > b.ws;
    });
    std::vector<RState> states;
    for (auto& s : raw) {
      if (states.empty() || states.back().mask != s.mask ||
          states.back().cont_j != s.cont_j)
        states.push_back(std::move(s));
    }
    std::stable_sort(states.begin(), states.end(),
                     [](const RState& a, const RState& b) {
                       if (a.cov != b.cov) return a.cov > b.cov;
                       if (a.c != b.c) return a.c < b.c;
                       if (a.d != b.d) return a.d < b.d;
                       if (a.ws != b.ws) return a.ws > b.ws;
                       if (a.mask != b.mask) return a.mask < b.mask;
                       return a.cont_j < b.cont_j;
                     });
    if (states.size() > (size_t)RESOLVE_BEAM) states.resize(RESOLVE_BEAM);
    if (i == n) return states.front().ml;
    for (const auto& s : states) {
      buckets[i + 1].push_back({s.cov, s.c, s.d, s.ws, s.mask, -1, s.ml});
      for (const auto& m : cand[i]) {
        unsigned __int128 span = ((((unsigned __int128)1) << m.jl) - 1) << m.j;
        if (s.mask & span) continue;
        RState t = s;
        t.cov += m.il + m.jl;
        // contiguous iff the previous match ended exactly here with its
        // ref span ending at j (>= 0 guards the broken sentinel vs j=0)
        t.c = (s.cont_j >= 0 && s.cont_j == m.j) ? s.c : s.c + 1;
        t.d += std::abs(m.i - m.j);
        t.ws += m.w;
        t.mask |= span;
        t.cont_j = m.j + m.jl;
        t.ml.push_back(m);
        buckets[i + m.il].push_back(std::move(t));
      }
    }
    buckets[i] = std::move(states);  // free the raw bucket
  }
  return {};  // unreachable
}

// Leftmost-greedy staged word-level fallback (only beyond the resolver's
// 128-word reference bound — never on caption-scale text). Mirrors
// _align_greedy.
std::vector<Match> align_greedy(size_t hyp_len, size_t ref_len,
                                const std::vector<std::vector<Match>>& cand) {
  std::vector<Match> matches;
  std::vector<bool> used_h(hyp_len, false), used_r(ref_len, false);
  for (double stage_weight : {W_EXACT, W_STEM, W_SYN}) {
    for (size_t i = 0; i < hyp_len; ++i) {
      if (used_h[i]) continue;
      for (const auto& m : cand[i]) {
        if (m.il == 1 && m.jl == 1 && !used_r[m.j] && m.w == stage_weight) {
          matches.push_back({(int)i, 1, m.j, 1, m.w});
          used_h[i] = true;
          used_r[m.j] = true;
          break;
        }
      }
    }
  }
  return matches;
}

double score_pair(const std::vector<std::string>& hyp,
                  const std::vector<std::string>& ref) {
  if (hyp.empty() || ref.empty()) return 0.0;
  auto cand = candidate_spans(hyp, ref);
  std::vector<Match> matches =
      ref.size() > MAX_REF_RESOLVE
          ? align_greedy(hyp.size(), ref.size(), cand)
          : resolve_alignment(hyp.size(), cand);
  if (matches.empty()) return 0.0;

  double w_hyp_total = 0, w_ref_total = 0, m_hyp = 0, m_ref = 0;
  long cov_h = 0, cov_r = 0;
  for (const auto& w : hyp) w_hyp_total += word_weight(w);
  for (const auto& w : ref) w_ref_total += word_weight(w);
  for (const auto& m : matches) {
    double wh = 0, wr = 0;
    for (int t = 0; t < m.il; ++t) wh += word_weight(hyp[m.i + t]);
    for (int t = 0; t < m.jl; ++t) wr += word_weight(ref[m.j + t]);
    m_hyp += m.w * wh;
    m_ref += m.w * wr;
    cov_h += m.il;
    cov_r += m.jl;
  }
  if (w_hyp_total == 0 || w_ref_total == 0) return 0.0;
  double P = m_hyp / w_hyp_total;
  double R = m_ref / w_ref_total;
  if (P + R == 0) return 0.0;
  double fmean = P * R / (ALPHA * P + (1 - ALPHA) * R);

  std::sort(matches.begin(), matches.end(),
            [](const Match& a, const Match& b) {
              return a.i < b.i || (a.i == b.i && a.j < b.j);
            });
  int chunks = 1;
  for (size_t k = 1; k < matches.size(); ++k) {
    if (!(matches[k].i == matches[k - 1].i + matches[k - 1].il &&
          matches[k].j == matches[k - 1].j + matches[k - 1].jl))
      ++chunks;
  }
  // METEOR 1.5: penalty applies unconditionally whenever matches > 0; with
  // phrase matches the denominator is the average covered-word count
  // (== match count when all matches are word-level).
  double frag = (double)chunks / ((cov_h + cov_r) / 2.0);
  double penalty = GAMMA * std::pow(frag, BETA);
  return (1.0 - penalty) * fmean;
}

}  // namespace

extern "C" {

// blob: one synonym group per '\n'-separated line, words space-separated
// (show_and_tell_tpu/metrics/synonyms.py serialize()). Replaces any prior
// table. Not thread-safe vs concurrent scoring; call once at load.
void meteor_set_synonyms(const char* blob) {
  auto& idx = synonym_index();
  idx.clear();
  std::string s(blob);
  int gid = 0;
  size_t start = 0;
  while (start <= s.size()) {
    size_t end = s.find('\n', start);
    if (end == std::string::npos) end = s.size();
    for (const auto& w : split_ws(s.substr(start, end - start))) {
      // index surface form and Porter stem (synonyms.build_index parity)
      auto& v = idx[w];
      if (v.empty() || v.back() != gid) v.push_back(gid);
      auto& vs = idx[porter_stem(w)];
      if (vs.empty() || vs.back() != gid) vs.push_back(gid);
    }
    ++gid;
    if (end == s.size()) break;
    start = end + 1;
  }
  // group ids are appended in increasing order, so vectors are sorted
}

// blob: one paraphrase group per '\n'-separated line, phrases separated by
// '|' (phrases contain spaces) — show_and_tell_tpu/metrics/paraphrases.py
// serialize(). Replaces any prior table. Not thread-safe vs concurrent
// scoring; call at load / table swap.
void meteor_set_paraphrases(const char* blob) {
  auto& idx = paraphrase_index();
  idx.clear();
  std::string s(blob);
  int gid = 0;
  size_t start = 0;
  while (start <= s.size()) {
    size_t end = s.find('\n', start);
    if (end == std::string::npos) end = s.size();
    std::string line = s.substr(start, end - start);
    size_t p0 = 0;
    while (p0 <= line.size() && !line.empty()) {
      size_t p1 = line.find('|', p0);
      if (p1 == std::string::npos) p1 = line.size();
      std::string phrase = line.substr(p0, p1 - p0);
      if (!phrase.empty()) {
        auto& v = idx[phrase];
        if (v.empty() || v.back() != gid) v.push_back(gid);
      }
      if (p1 == line.size()) break;
      p0 = p1 + 1;
    }
    ++gid;
    if (end == s.size()) break;
    start = end + 1;
  }
  // group ids appended in increasing order, so vectors are sorted
}

char* meteor_stem(const char* word) {
  std::string s = porter_stem(word);
  char* out = static_cast<char*>(std::malloc(s.size() + 1));
  std::memcpy(out, s.c_str(), s.size() + 1);
  return out;
}

void meteor_free(char* p) { std::free(p); }

// refs are joined with '\x01'. Returns max over references.
double meteor_score(const char* hypothesis, const char* refs_joined) {
  std::vector<std::string> hyp = split_ws(hypothesis);
  if (hyp.empty()) return 0.0;
  double best = 0.0;
  std::string refs(refs_joined);
  size_t start = 0;
  while (start <= refs.size()) {
    size_t end = refs.find('\x01', start);
    if (end == std::string::npos) end = refs.size();
    std::vector<std::string> ref = split_ws(refs.substr(start, end - start));
    best = std::max(best, score_pair(hyp, ref));
    if (end == refs.size()) break;
    start = end + 1;
  }
  return best;
}

}  // extern "C"
