// PTB tokenizer — C++ fast path for the metrics pipeline.
//
// The reference launches a JVM running Stanford CoreNLP's PTBTokenizer for
// every evaluation (pycocoevalcap/tokenizer/ptbtokenizer.py:28-53). This
// library reproduces the tokenizer behavior the caption-metric path needs
// (lowercase, ascii, punctuation splitting, contractions, bracket
// normalisation) plus the post-hoc punctuation strip
// (ptbtokenizer.py:21-22,64-65), behind a C ABI consumed via ctypes
// (show_and_tell_tpu/metrics/tokenizer.py).
//
// The rule set matches the Python fallback implementation in
// metrics/tokenizer.py exactly; tests/test_native.py asserts equality over a
// corpus.
//
// Build: make -C csrc    (produces libptb_tokenizer.so)

#include <cctype>
#include <cstdlib>
#include <cstring>
#include <regex>
#include <set>
#include <string>
#include <vector>

namespace {

const std::set<std::string> kPunct = {
    "''", "'",  "``", "`",  "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".",  "?",  "!",  ",",  ":",     "-",     "--",    "...",   ";"};

struct Rule {
  std::regex pat;
  std::string repl;
};

// Mirrors metrics/tokenizer.py::_RULES (ECMAScript syntax; $& = whole match).
const std::vector<Rule>& rules() {
  static const std::vector<Rule> r = {
      {std::regex("^\""), "`` "},
      {std::regex("(``)"), " $1 "},
      {std::regex("([ (\\[{<])\""), "$1 `` "},
      {std::regex("\\.\\.\\."), " ... "},
      {std::regex("[;@#$%&]"), " $& "},
      // PTB lexical splits (cannot -> can not, etc.)
      {std::regex("\\b(can)(not)\\b"), "$1 $2"},
      {std::regex("\\b(gon|wan)(na)\\b"), "$1 $2"},
      {std::regex("\\b(got|out)(ta)\\b"), "$1 $2"},
      {std::regex("\\b(gim|lem)(me)\\b"), "$1 $2"},
      // final period; two-char guard keeps sentence-final acronyms intact
      {std::regex("(^|[^\\.])([^\\.\\s])(\\.)([\\]\\)}>\"']*)\\s*$"),
       "$1$2 $3$4 "},
      {std::regex("[?!]"), " $& "},
      {std::regex("[\\]\\[(){}<>]"), " $& "},
      {std::regex("--"), " -- "},
      {std::regex("([^0-9]),"), "$1 , "},
      {std::regex(",([^0-9])"), " , $1"},
      {std::regex("([^0-9]):"), "$1 : "},
      {std::regex(":([^0-9])"), " : $1"},
      {std::regex("\""), " '' "},
      {std::regex("(\\S)('')"), "$1 $2 "},
      {std::regex("([^' ])('[sS]|'[mM]|'[dD]|') "), "$1 $2 "},
      {std::regex("([^' ])('ll|'re|'ve|n't|'LL|'RE|'VE|N'T) "), "$1 $2 "},
  };
  return r;
}

std::string bracket_token(const std::string& t) {
  if (t == "(") return "-LRB-";
  if (t == ")") return "-RRB-";
  if (t == "{") return "-LCB-";
  if (t == "}") return "-RCB-";
  if (t == "[") return "-LSB-";
  if (t == "]") return "-RSB-";
  return t;
}

}  // namespace

extern "C" {

// Tokenize + strip punctuation; returns a malloc'd space-joined string.
// Caller must release with ptb_free().
char* ptb_tokenize(const char* input) {
  std::string s;
  for (const char* p = input; *p; ++p) {
    unsigned char c = static_cast<unsigned char>(*p);
    if (c >= 128) continue;  // ascii-ignore (ptbtokenizer.py:45)
    s.push_back(c == '\n' ? ' ' : static_cast<char>(std::tolower(c)));
  }
  s = " " + s + " ";
  for (const Rule& r : rules()) {
    s = std::regex_replace(s, r.pat, r.repl);
  }
  // split on whitespace, normalise brackets, strip punctuation list
  std::string out;
  size_t i = 0;
  while (i < s.size()) {
    while (i < s.size() && std::isspace(static_cast<unsigned char>(s[i]))) ++i;
    size_t j = i;
    while (j < s.size() && !std::isspace(static_cast<unsigned char>(s[j]))) ++j;
    if (j > i) {
      std::string tok = bracket_token(s.substr(i, j - i));
      if (kPunct.find(tok) == kPunct.end()) {
        if (!out.empty()) out.push_back(' ');
        out += tok;
      }
    }
    i = j;
  }
  char* res = static_cast<char*>(std::malloc(out.size() + 1));
  std::memcpy(res, out.c_str(), out.size() + 1);
  return res;
}

void ptb_free(char* p) { std::free(p); }

}  // extern "C"
