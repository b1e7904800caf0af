// Native greedy overlap assembler for partitioned read sets.
//
// The kevlar-tpu equivalent of the reference's fermi-lite bridge
// (/root/reference/kevlar/assembly.pyx -> fml_assemble): partitions are
// small (<= 10000 reads, typically dozens) sets of error-corrected reads
// covering one variant locus, so a strand-aware greedy merge of the longest
// exact suffix-prefix overlaps reconstructs the locus contig without the
// FMD-index machinery.  Containments are absorbed; merging repeats until no
// overlap >= min_overlap remains.
//
// C ABI:
//   int kt_assemble(const char** reads, int nreads, int min_overlap,
//                   char* out, int out_cap);
//     returns #contigs; contigs are nul-separated in `out`.

#include <algorithm>
#include <cstring>
#include <string>
#include <vector>

namespace {

std::string revcom(const std::string &s) {
    std::string r(s.rbegin(), s.rend());
    for (auto &c : r) {
        switch (c) {
            case 'A': c = 'T'; break;
            case 'C': c = 'G'; break;
            case 'G': c = 'C'; break;
            case 'T': c = 'A'; break;
            case 'a': c = 't'; break;
            case 'c': c = 'g'; break;
            case 'g': c = 'c'; break;
            case 't': c = 'a'; break;
            default: break;
        }
    }
    return r;
}

// longest exact suffix(a)-prefix(b) overlap, in [min_ovl, min(|a|,|b|)]
int best_overlap(const std::string &a, const std::string &b, int min_ovl) {
    int maxovl = (int)std::min(a.size(), b.size());
    for (int ovl = maxovl; ovl >= min_ovl; --ovl) {
        if (std::memcmp(a.data() + a.size() - ovl, b.data(), ovl) == 0)
            return ovl;
    }
    return 0;
}

struct Merge {
    int i, j, ovl;
    bool rc_j;     // reverse-complement read j before appending
    bool j_first;  // overlap found as suffix(j variant)-prefix(i)
};

}  // namespace

extern "C" {

int kt_assemble(const char **reads, int nreads, int min_overlap, char *out,
                int out_cap) {
    std::vector<std::string> contigs;
    contigs.reserve(nreads);
    // containment/duplicate absorption on input (canonical compare)
    for (int i = 0; i < nreads; ++i) {
        std::string s(reads[i]);
        if (s.empty()) continue;
        contigs.push_back(std::move(s));
    }
    // sort longest-first for deterministic greedy behavior
    std::stable_sort(contigs.begin(), contigs.end(),
                     [](const std::string &a, const std::string &b) {
                         if (a.size() != b.size())
                             return a.size() > b.size();
                         return a < b;
                     });
    // drop exact containments (either strand)
    std::vector<std::string> kept;
    for (auto &s : contigs) {
        bool contained = false;
        std::string rc = revcom(s);
        for (auto &k : kept) {
            if (k.find(s) != std::string::npos ||
                k.find(rc) != std::string::npos) {
                contained = true;
                break;
            }
        }
        if (!contained) kept.push_back(s);
    }
    contigs.swap(kept);

    bool merged = true;
    while (merged && contigs.size() > 1) {
        merged = false;
        Merge best{-1, -1, 0, false, false};
        for (int i = 0; i < (int)contigs.size() && !merged; ++i) {
            for (int j = i + 1; j < (int)contigs.size(); ++j) {
                const std::string &a = contigs[i];
                const std::string &b = contigs[j];
                std::string brc = revcom(b);
                struct Cand { const std::string *s; bool rc; bool jf; };
                Cand cands[4] = {
                    {&b, false, false},   // a + b
                    {&brc, true, false},  // a + rc(b)
                    {&b, false, true},    // b + a
                    {&brc, true, true},   // rc(b) + a
                };
                for (auto &c : cands) {
                    int ovl = c.jf ? best_overlap(*c.s, a, min_overlap)
                                   : best_overlap(a, *c.s, min_overlap);
                    if (ovl > best.ovl) {
                        best = {i, j, ovl, c.rc, c.jf};
                    }
                }
            }
        }
        if (best.ovl >= min_overlap) {
            std::string a = contigs[best.i];
            std::string b = contigs[best.j];
            if (best.rc_j) b = revcom(b);
            std::string joined = best.j_first
                ? b + a.substr(best.ovl)
                : a + b.substr(best.ovl);
            // remove j first (higher index), then i
            contigs.erase(contigs.begin() + best.j);
            contigs.erase(contigs.begin() + best.i);
            // absorb any contigs contained in the joined sequence
            std::string jrc = revcom(joined);
            std::vector<std::string> next;
            for (auto &s : contigs) {
                if (joined.find(s) == std::string::npos &&
                    jrc.find(s) == std::string::npos)
                    next.push_back(s);
            }
            next.push_back(joined);
            contigs.swap(next);
            merged = true;
        }
    }

    std::stable_sort(contigs.begin(), contigs.end(),
                     [](const std::string &a, const std::string &b) {
                         if (a.size() != b.size())
                             return a.size() > b.size();
                         return a < b;
                     });
    int pos = 0, n = 0;
    for (auto &s : contigs) {
        int need = (int)s.size() + 1;
        if (pos + need > out_cap) break;
        std::memcpy(out + pos, s.c_str(), need);
        pos += need;
        ++n;
    }
    return n;
}

}  // extern "C"
