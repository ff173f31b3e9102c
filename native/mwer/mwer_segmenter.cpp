// mwer_segmenter — minimum-WER resegmentation of unsegmented hypothesis
// text against a reference segmentation (Matusov et al., 2005).
//
// Native replacement for the external mwerSegmenter tarball the reference
// pipeline downloads and shells out to (reference runs/setup_tools.sh:8-12,
// inference_st_pipe.py:140-148).  Same CLI contract as
// segmentBasedOnMWER.sh: given a source mteval XML, a reference mteval XML,
// and a hypothesis text (one line per document-order translation), produce
//   __segments    resegmented hypothesis, one line per reference segment
//   __mreference  normalized reference, one line per segment
//   <output.xml>  hypothesis wrapped as an mteval sgm set
//
// Algorithm: per document, Levenshtein-align the concatenated hypothesis
// words to the concatenated reference words (unit costs); hypothesis
// boundaries are placed where the optimal path crosses a reference segment
// boundary.  DP is O(N*M) time with an O(N*M) byte traceback, run per doc.
//
// Usage:
//   mwer_segmenter <source.xml> <ref.xml> <hyp.txt> <sysid> <lang>
//                  <output.xml> [normalize|no-normalize] [usecase(0|1)]

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <map>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct Doc {
  std::string docid;
  std::vector<std::string> segs;  // raw segment text
};

// ---------------------------------------------------------------------------
// minimal mteval XML parsing (we also generate these files ourselves, see
// stpipe/xml.py, so only <doc docid=...> and <seg ...>text</seg> matter)
// ---------------------------------------------------------------------------
std::vector<Doc> parse_mteval(const std::string& path) {
  std::ifstream in(path);
  if (!in) {
    std::cerr << "cannot open " << path << "\n";
    std::exit(1);
  }
  std::vector<Doc> docs;
  std::string line;
  while (std::getline(in, line)) {
    auto dpos = line.find("<doc ");
    if (dpos != std::string::npos) {
      auto idpos = line.find("docid=\"", dpos);
      std::string docid;
      if (idpos != std::string::npos) {
        idpos += 7;
        auto end = line.find('"', idpos);
        docid = line.substr(idpos, end - idpos);
      }
      docs.push_back({docid, {}});
      continue;
    }
    auto spos = line.find("<seg");
    if (spos != std::string::npos && !docs.empty()) {
      auto gt = line.find('>', spos);
      auto close = line.rfind("</seg>");
      if (gt != std::string::npos && close != std::string::npos && close > gt) {
        docs.back().segs.push_back(line.substr(gt + 1, close - gt - 1));
      }
    }
  }
  return docs;
}

// ---------------------------------------------------------------------------
// NIST-style text normalization (normalizeTextNIST.pl semantics: lowercase
// unless case-sensitive, punctuation split into separate tokens, whitespace
// collapsed)
// ---------------------------------------------------------------------------
bool is_punct_byte(unsigned char c) {
  return std::ispunct(c) && c != '\'' && c != '-';
}

std::string normalize_text(const std::string& s, bool case_sensitive) {
  std::string out;
  out.reserve(s.size() * 2);
  for (size_t i = 0; i < s.size(); ++i) {
    unsigned char c = s[i];
    if (c < 128 && is_punct_byte(c)) {
      out.push_back(' ');
      out.push_back(static_cast<char>(c));
      out.push_back(' ');
    } else if (c < 128 && !case_sensitive) {
      out.push_back(static_cast<char>(std::tolower(c)));
    } else {
      out.push_back(static_cast<char>(c));
    }
  }
  // collapse whitespace
  std::string collapsed;
  collapsed.reserve(out.size());
  bool in_space = true;
  for (char c : out) {
    if (std::isspace(static_cast<unsigned char>(c))) {
      if (!in_space) collapsed.push_back(' ');
      in_space = true;
    } else {
      collapsed.push_back(c);
      in_space = false;
    }
  }
  while (!collapsed.empty() && collapsed.back() == ' ') collapsed.pop_back();
  return collapsed;
}

std::vector<std::string> tokenize(const std::string& s) {
  std::vector<std::string> words;
  std::istringstream iss(s);
  std::string w;
  while (iss >> w) words.push_back(w);
  return words;
}

// ---------------------------------------------------------------------------
// per-document mWER alignment
// ---------------------------------------------------------------------------
std::vector<std::vector<std::string>> align_doc(
    const std::vector<std::string>& hyp_words,
    const std::vector<std::vector<std::string>>& ref_segs) {
  const size_t n = hyp_words.size();
  std::vector<std::string> ref_words;
  std::vector<size_t> seg_of;  // ref word index -> segment index
  for (size_t k = 0; k < ref_segs.size(); ++k)
    for (const auto& w : ref_segs[k]) {
      ref_words.push_back(w);
      seg_of.push_back(k);
    }
  const size_t m = ref_words.size();
  const size_t K = ref_segs.size();

  std::vector<std::vector<std::string>> out(K);
  if (K == 0) return out;
  if (m == 0) {  // everything into the first segment
    out[0] = hyp_words;
    return out;
  }

  // intern words for fast comparison
  std::map<std::string, int> intern;
  auto id_of = [&](const std::string& w) {
    auto it = intern.find(w);
    if (it != intern.end()) return it->second;
    int id = static_cast<int>(intern.size());
    intern.emplace(w, id);
    return id;
  };
  std::vector<int> h(n), r(m);
  for (size_t i = 0; i < n; ++i) h[i] = id_of(hyp_words[i]);
  for (size_t j = 0; j < m; ++j) r[j] = id_of(ref_words[j]);

  // Levenshtein DP with byte traceback: 0=diag, 1=up(del hyp), 2=left(ins)
  std::vector<uint32_t> prev(m + 1), cur(m + 1);
  std::vector<uint8_t> tb((n + 1) * (m + 1));
  for (size_t j = 0; j <= m; ++j) {
    prev[j] = static_cast<uint32_t>(j);
    tb[j] = 2;
  }
  for (size_t i = 1; i <= n; ++i) {
    cur[0] = static_cast<uint32_t>(i);
    tb[i * (m + 1)] = 1;
    for (size_t j = 1; j <= m; ++j) {
      uint32_t sub = prev[j - 1] + (h[i - 1] == r[j - 1] ? 0u : 1u);
      uint32_t del = prev[j] + 1;  // hyp word unmatched (insertion in hyp)
      uint32_t ins = cur[j - 1] + 1;  // ref word unmatched
      uint32_t best = sub;
      uint8_t dir = 0;
      if (del < best) { best = del; dir = 1; }
      if (ins < best) { best = ins; dir = 2; }
      cur[j] = best;
      tb[i * (m + 1) + j] = dir;
    }
    std::swap(prev, cur);
  }

  // traceback: assign each hyp word to the segment of the ref word it is
  // aligned with (or the segment active at that point for insertions)
  std::vector<size_t> assign(n, K - 1);
  size_t i = n, j = m;
  while (i > 0 || j > 0) {
    uint8_t dir = tb[i * (m + 1) + j];
    if (i > 0 && j > 0 && dir == 0) {
      assign[i - 1] = seg_of[j - 1];
      --i; --j;
    } else if (i > 0 && (dir == 1 || j == 0)) {
      // hyp word with no ref counterpart: segment of the nearest ref word
      assign[i - 1] = (j > 0) ? seg_of[j - 1] : 0;
      --i;
    } else {
      --j;
    }
  }
  for (size_t w = 0; w < n; ++w) out[assign[w]].push_back(hyp_words[w]);
  return out;
}

std::string join(const std::vector<std::string>& ws) {
  std::string s;
  for (size_t i = 0; i < ws.size(); ++i) {
    if (i) s.push_back(' ');
    s += ws[i];
  }
  return s;
}

std::string xml_escape(const std::string& s) {
  std::string o;
  for (char c : s) {
    switch (c) {
      case '&': o += "&amp;"; break;
      case '<': o += "&lt;"; break;
      case '>': o += "&gt;"; break;
      default: o.push_back(c);
    }
  }
  return o;
}

}  // namespace

int run_mref_mode(int argc, char** argv) {
  // raw binary interface: mwer_segmenter -mref <segments.txt> -hypfile
  // <text.txt> [-usecase 1] — resegment hypfile against the line
  // segmentation of mref; writes __segments in CWD (the interface
  // lib/analysis/get_statistics.py:33-36 drives).
  std::string mref_path, hyp_path;
  for (int i = 1; i + 1 < argc; ++i) {
    std::string a = argv[i];
    if (a == "-mref") mref_path = argv[i + 1];
    if (a == "-hypfile") hyp_path = argv[i + 1];
  }
  if (mref_path.empty() || hyp_path.empty()) {
    std::cerr << "usage: mwer_segmenter -mref <ref.txt> -hypfile <hyp.txt>\n";
    return 2;
  }
  std::ifstream rin(mref_path), hin(hyp_path);
  if (!rin || !hin) {
    std::cerr << "cannot open inputs\n";
    return 1;
  }
  std::vector<std::vector<std::string>> ref_segs;
  std::string line;
  while (std::getline(rin, line)) ref_segs.push_back(tokenize(line));
  std::string all_hyp;
  while (std::getline(hin, line)) {
    all_hyp += line;
    all_hyp.push_back(' ');
  }
  auto segs = align_doc(tokenize(all_hyp), ref_segs);
  std::ofstream fseg("__segments");
  for (const auto& s : segs) fseg << join(s) << "\n";
  return 0;
}

int main(int argc, char** argv) {
  if (argc >= 2 && std::string(argv[1]) == "-mref") {
    return run_mref_mode(argc, argv);
  }
  if (argc < 7) {
    std::cerr << "usage: mwer_segmenter <source.xml> <ref.xml> <hyp.txt> "
                 "<sysid> <lang> <output.xml> [normalize] [usecase]\n"
                 "   or: mwer_segmenter -mref <ref.txt> -hypfile <hyp.txt>\n";
    return 2;
  }
  const std::string ref_xml = argv[2];
  const std::string hyp_txt = argv[3];
  const std::string sysid = argv[4];
  const std::string lang = argv[5];
  const std::string out_xml = argv[6];
  const bool normalize = argc < 8 || std::string(argv[7]) != "no-normalize";
  const bool case_sensitive = argc >= 9 && std::string(argv[8]) == "1";

  auto ref_docs = parse_mteval(ref_xml);

  // hypothesis: one line per source segment produced by the upstream
  // generation; all lines of a doc are concatenated before realignment.
  std::ifstream hin(hyp_txt);
  if (!hin) {
    std::cerr << "cannot open " << hyp_txt << "\n";
    return 1;
  }
  std::vector<std::string> hyp_lines;
  std::string line;
  while (std::getline(hin, line)) hyp_lines.push_back(line);
  std::string all_hyp;
  for (const auto& l : hyp_lines) {
    all_hyp += l;
    all_hyp.push_back(' ');
  }

  // normalize
  auto norm = [&](const std::string& s) {
    return normalize ? normalize_text(s, case_sensitive) : s;
  };
  std::vector<std::string> hyp_words = tokenize(norm(all_hyp));

  // total ref words per doc to apportion hypothesis words proportionally
  size_t total_ref_words = 0;
  std::vector<std::vector<std::vector<std::string>>> ref_tok(ref_docs.size());
  std::vector<size_t> doc_ref_words(ref_docs.size(), 0);
  for (size_t d = 0; d < ref_docs.size(); ++d) {
    for (const auto& seg : ref_docs[d].segs) {
      ref_tok[d].push_back(tokenize(norm(seg)));
      doc_ref_words[d] += ref_tok[d].back().size();
    }
    total_ref_words += doc_ref_words[d];
  }

  // Two-level alignment: first split the hypothesis stream across docs with
  // the same DP (docs as "segments"), then align within each doc.
  std::vector<std::vector<std::string>> doc_refs_flat(ref_docs.size());
  for (size_t d = 0; d < ref_docs.size(); ++d) {
    for (const auto& seg : ref_tok[d])
      for (const auto& w : seg) doc_refs_flat[d].push_back(w);
  }
  auto hyp_per_doc = align_doc(hyp_words, doc_refs_flat);

  std::ofstream fseg("__segments"), fref("__mreference"), fxml(out_xml);
  fxml << "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<mteval>\n"
       << "<tstset setid=\"aligned\" srclang=\"src\" trglang=\"" << lang
       << "\" sysid=\"" << sysid << "\">\n";
  for (size_t d = 0; d < ref_docs.size(); ++d) {
    auto segs = align_doc(hyp_per_doc[d], ref_tok[d]);
    fxml << "<doc docid=\"" << ref_docs[d].docid << "\" genre=\"lectures\">\n";
    for (size_t k = 0; k < segs.size(); ++k) {
      std::string hyp_line = join(segs[k]);
      fseg << hyp_line << "\n";
      fref << join(ref_tok[d][k]) << "\n";
      fxml << "<seg id=\"" << (k + 1) << "\">" << xml_escape(hyp_line)
           << "</seg>\n";
    }
    fxml << "</doc>\n";
  }
  fxml << "</tstset>\n</mteval>\n";
  return 0;
}
