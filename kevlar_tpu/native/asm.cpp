// Native assembler for partitioned read sets: greedy overlap layout with a
// per-column pileup consensus.
//
// The kevlar-tpu equivalent of the reference's fermi-lite bridge
// (/root/reference/kevlar/assembly.pyx -> fml_assemble).  fermi-lite runs
// BFC error correction, an FMD-index overlap graph, and unitig cleaning;
// partitions here are small (<= 10000 reads, typically dozens) reads covering
// one variant locus, so a simpler design reaches the same contigs:
//
//  1. greedy merging of the longest suffix-prefix overlaps (strand-aware,
//     containment absorbing), tolerating a bounded mismatch rate in the
//     overlap (sequencing errors);
//  2. every merged read is laid into a per-column base-count pileup; the
//     emitted contig is the column-wise majority consensus, which corrects
//     isolated sequencing errors wherever coverage >= ~3.
//
// C ABI:
//   int kt_assemble(const char** reads, int nreads, int min_overlap,
//                   char* out, int out_cap);
//     returns #contigs; contigs are nul-separated in `out`.
//     (mismatch tolerance is fixed at 4% of the overlap length, matching
//     typical post-QC error rates; exact overlaps always win ties.)

#include <algorithm>
#include <array>
#include <cstring>
#include <string>
#include <vector>

namespace {

const double MAX_DIV = 0.04;  // max mismatch fraction within an overlap

int base_index(char c) {
    switch (c) {
        case 'A': case 'a': return 0;
        case 'C': case 'c': return 1;
        case 'G': case 'g': return 2;
        case 'T': case 't': return 3;
        default: return -1;
    }
}

const char BASES[5] = "ACGT";

std::string revcom(const std::string &s) {
    std::string r(s.rbegin(), s.rend());
    for (auto &c : r) {
        switch (c) {
            case 'A': c = 'T'; break;
            case 'C': c = 'G'; break;
            case 'G': c = 'C'; break;
            case 'T': c = 'A'; break;
            default: break;
        }
    }
    return r;
}

// A contig under construction: consensus string + per-column base counts.
struct Pileup {
    std::string seq;                        // current consensus
    std::vector<std::array<int, 4>> cnt;    // per-column base votes

    static Pileup from_read(const std::string &r) {
        Pileup p;
        p.seq = r;
        p.cnt.resize(r.size());
        for (size_t i = 0; i < r.size(); ++i) {
            p.cnt[i] = {0, 0, 0, 0};
            int b = base_index(r[i]);
            if (b >= 0) p.cnt[i][b] = 1;
        }
        return p;
    }

    void refresh_consensus() {
        for (size_t i = 0; i < cnt.size(); ++i) {
            int best = base_index(seq[i]);
            if (best < 0) best = 0;
            int bestn = cnt[i][best];
            for (int b = 0; b < 4; ++b) {
                if (cnt[i][b] > bestn) {
                    best = b;
                    bestn = cnt[i][b];
                }
            }
            seq[i] = BASES[best];
        }
    }

    Pileup reverse_complemented() const {
        Pileup p;
        p.seq = revcom(seq);
        p.cnt.resize(cnt.size());
        for (size_t i = 0; i < cnt.size(); ++i) {
            const auto &src = cnt[cnt.size() - 1 - i];
            p.cnt[i] = {src[3], src[2], src[1], src[0]};  // complement votes
        }
        return p;
    }

    int weight() const {
        int w = 0;
        for (const auto &c : cnt) w += c[0] + c[1] + c[2] + c[3];
        return w;
    }
};

// longest suffix(a)-prefix(b) overlap with mismatch tolerance; returns
// (overlap_len, n_mismatches) with exact overlaps preferred at equal length
std::pair<int, int> best_overlap(const std::string &a, const std::string &b,
                                 int min_ovl) {
    int maxovl = (int)std::min(a.size(), b.size());
    for (int ovl = maxovl; ovl >= min_ovl; --ovl) {
        int budget = (int)(MAX_DIV * ovl);
        int mm = 0;
        const char *pa = a.data() + a.size() - ovl;
        const char *pb = b.data();
        bool ok = true;
        for (int i = 0; i < ovl; ++i) {
            if (pa[i] != pb[i]) {
                if (++mm > budget) { ok = false; break; }
            }
        }
        if (ok) return {ovl, mm};
    }
    return {0, 0};
}

// is `inner` contained in `outer` with a bounded mismatch count?
bool contained_in(const std::string &inner, const std::string &outer) {
    if (inner.size() > outer.size()) return false;
    int budget = (int)(MAX_DIV * inner.size());
    for (size_t off = 0; off + inner.size() <= outer.size(); ++off) {
        int mm = 0;
        bool ok = true;
        for (size_t i = 0; i < inner.size(); ++i) {
            if (outer[off + i] != inner[i]) {
                if (++mm > budget) { ok = false; break; }
            }
        }
        if (ok) return true;
    }
    return false;
}

Pileup merge(const Pileup &a, const Pileup &b, int ovl) {
    Pileup out = a;
    // overlapped columns: add votes
    size_t start = a.seq.size() - ovl;
    for (int i = 0; i < ovl; ++i) {
        for (int x = 0; x < 4; ++x)
            out.cnt[start + i][x] += b.cnt[i][x];
    }
    // tail columns
    out.seq += b.seq.substr(ovl);
    for (size_t i = ovl; i < b.cnt.size(); ++i) out.cnt.push_back(b.cnt[i]);
    out.refresh_consensus();
    return out;
}

// absorb `inner` into `outer`'s pileup at its best (mismatch-tolerant)
// placement; returns false if no placement fits
bool absorb(Pileup &outer, const Pileup &inner) {
    int budget = (int)(MAX_DIV * inner.seq.size());
    int best_off = -1, best_mm = budget + 1;
    for (size_t off = 0; off + inner.seq.size() <= outer.seq.size(); ++off) {
        int mm = 0;
        bool ok = true;
        for (size_t i = 0; i < inner.seq.size(); ++i) {
            if (outer.seq[off + i] != inner.seq[i]) {
                if (++mm >= best_mm) { ok = false; break; }
            }
        }
        if (ok && mm < best_mm) {
            best_mm = mm;
            best_off = (int)off;
            if (mm == 0) break;
        }
    }
    if (best_off < 0) return false;
    for (size_t i = 0; i < inner.cnt.size(); ++i)
        for (int x = 0; x < 4; ++x)
            outer.cnt[best_off + i][x] += inner.cnt[i][x];
    outer.refresh_consensus();
    return true;
}

}  // namespace

extern "C" {

int kt_assemble(const char **reads, int nreads, int min_overlap, char *out,
                int out_cap) {
    std::vector<Pileup> contigs;
    std::vector<std::string> inputs;
    inputs.reserve(nreads);
    for (int i = 0; i < nreads; ++i) {
        std::string s(reads[i]);
        if (!s.empty()) inputs.push_back(std::move(s));
    }
    std::stable_sort(inputs.begin(), inputs.end(),
                     [](const std::string &a, const std::string &b) {
                         if (a.size() != b.size()) return a.size() > b.size();
                         return a < b;
                     });
    // containment absorption on input (votes still counted)
    for (auto &s : inputs) {
        std::string rc = revcom(s);
        bool absorbed = false;
        for (auto &c : contigs) {
            if (contained_in(s, c.seq)) {
                absorbed = absorb(c, Pileup::from_read(s));
            } else if (contained_in(rc, c.seq)) {
                absorbed = absorb(c, Pileup::from_read(rc));
            }
            if (absorbed) break;
        }
        if (!absorbed) contigs.push_back(Pileup::from_read(s));
    }

    bool merged = true;
    while (merged && contigs.size() > 1) {
        merged = false;
        int bi = -1, bj = -1, bovl = 0, bmm = 1 << 30;
        bool brc = false, bjfirst = false;
        for (int i = 0; i < (int)contigs.size(); ++i) {
            for (int j = i + 1; j < (int)contigs.size(); ++j) {
                const std::string &a = contigs[i].seq;
                const std::string &b = contigs[j].seq;
                std::string brcs = revcom(b);
                struct Cand { const std::string *s; bool rc; bool jf; };
                Cand cands[4] = {
                    {&b, false, false}, {&brcs, true, false},
                    {&b, false, true}, {&brcs, true, true},
                };
                for (auto &c : cands) {
                    auto res = c.jf ? best_overlap(*c.s, a, min_overlap)
                                    : best_overlap(a, *c.s, min_overlap);
                    if (res.first > bovl ||
                        (res.first == bovl && res.second < bmm)) {
                        bi = i; bj = j; bovl = res.first; bmm = res.second;
                        brc = c.rc; bjfirst = c.jf;
                    }
                }
            }
        }
        if (bovl >= min_overlap) {
            Pileup a = contigs[bi];
            Pileup b = brc ? contigs[bj].reverse_complemented() : contigs[bj];
            Pileup joined = bjfirst ? merge(b, a, bovl) : merge(a, b, bovl);
            contigs.erase(contigs.begin() + bj);
            contigs.erase(contigs.begin() + bi);
            // absorb contigs now contained in the joined consensus
            std::vector<Pileup> next;
            for (auto &c : contigs) {
                if (contained_in(c.seq, joined.seq)) {
                    absorb(joined, c);
                } else if (contained_in(revcom(c.seq), joined.seq)) {
                    absorb(joined, c.reverse_complemented());
                } else {
                    next.push_back(c);
                }
            }
            next.push_back(joined);
            contigs.swap(next);
            merged = true;
        }
    }

    std::stable_sort(contigs.begin(), contigs.end(),
                     [](const Pileup &a, const Pileup &b) {
                         if (a.seq.size() != b.seq.size())
                             return a.seq.size() > b.seq.size();
                         return a.seq < b.seq;
                     });
    int pos = 0, n = 0;
    for (auto &c : contigs) {
        int need = (int)c.seq.size() + 1;
        if (pos + need > out_cap) break;
        std::memcpy(out + pos, c.seq.c_str(), need);
        pos += need;
        ++n;
    }
    return n;
}

}  // extern "C"
