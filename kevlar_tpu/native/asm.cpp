// Native assembler for partitioned read sets: spectral error correction +
// greedy overlap layout with a per-column pileup consensus.
//
// The kevlar-tpu equivalent of the reference's fermi-lite bridge
// (/root/reference/kevlar/assembly.pyx -> fml_assemble).  fermi-lite runs
// BFC error correction, an FMD-index overlap graph, and unitig cleaning;
// partitions here are small (<= 10000 reads, typically dozens) reads covering
// one variant locus, so a simpler design reaches the same contigs:
//
//  0. BFC-analog spectral correction: count the partition's canonical
//     k-mers; substitution errors show up as maximal runs of weak
//     (count < 2) k-mer windows flanked by solid ones, and are repaired by
//     the unique base substitution that turns the whole run solid
//     (conservative: anchored runs only, one substitution per run, never
//     introduces a k-mer that is not already solid in the partition);
//  1. greedy merging of the longest suffix-prefix overlaps (strand-aware,
//     containment absorbing), tolerating a bounded mismatch rate in the
//     overlap (residual sequencing errors);
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
//   int kt_correct(const char** reads, int nreads, int k, int minabund,
//                  char* out, int out_cap);
//     spectral correction alone (nul-separated corrected reads).

#include <algorithm>
#include <array>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
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

// ---------------------------------------------------------------------------
// Spectral (k-mer spectrum) error correction — the BFC analog.
// ---------------------------------------------------------------------------

// 2-bit encodings of the forward and reverse-complement k-mer ending at
// position p are maintained incrementally by the callers below.
struct KmerSpectrum {
    int k;
    uint64_t mask;
    std::unordered_map<uint64_t, uint32_t> counts;

    explicit KmerSpectrum(int k_)
        : k(k_), mask(k_ >= 32 ? ~0ULL : ((1ULL << (2 * k_)) - 1)) {}

    static uint64_t canon(uint64_t fwd, uint64_t rev) {
        return fwd < rev ? fwd : rev;
    }

    void add_read(const std::string &s) {
        uint64_t fwd = 0, rev = 0;
        int run = 0;  // consecutive valid bases ending here
        for (size_t i = 0; i < s.size(); ++i) {
            int b = base_index(s[i]);
            if (b < 0) { run = 0; fwd = rev = 0; continue; }
            fwd = ((fwd << 2) | (uint64_t)b) & mask;
            rev = (rev >> 2) | ((uint64_t)(3 - b) << (2 * (k - 1)));
            if (++run >= k) counts[canon(fwd, rev)]++;
        }
    }

    uint32_t get(uint64_t fwd, uint64_t rev) const {
        auto it = counts.find(canon(fwd, rev));
        return it == counts.end() ? 0 : it->second;
    }

    // count of the k-mer s[i..i+k) with positions p/p2 substituted by
    // bases nb/nb2; returns 0 if any base in the window is invalid
    uint32_t window_count(const std::string &s, int i, int p, int nb,
                          int p2 = -1, int nb2 = 0) const {
        uint64_t fwd = 0, rev = 0;
        for (int j = 0; j < k; ++j) {
            int b = (i + j == p) ? nb
                  : (i + j == p2) ? nb2 : base_index(s[i + j]);
            if (b < 0) return 0;
            fwd = ((fwd << 2) | (uint64_t)b) & mask;
            rev = (rev >> 2) | ((uint64_t)(3 - b) << (2 * (k - 1)));
        }
        return get(fwd, rev);
    }
};

// Correct isolated substitution errors in `s` against the spectrum.
// A substitution at read position p invalidates exactly the windows
// [p-k+1, p]; so a maximal run of weak windows [i..j] anchored by solid
// neighbours (or a read edge) is attributed to a single error at some
// p in [j, i+k-1], and repaired iff exactly locating a base that makes
// every window in the run solid.  Conservative by construction: novel
// (variant) k-mers are shared across the partition's reads, hence solid,
// hence never touched.
bool spectral_correct_read(std::string &s, const KmerSpectrum &spec,
                           uint32_t minabund) {
    int k = spec.k;
    int P = (int)s.size() - k + 1;
    if (P < 2) return false;
    // solidity per window: -1 invalid (contains N), 0 weak, 1 solid
    std::vector<int8_t> solid(P, -1);
    {
        uint64_t fwd = 0, rev = 0;
        int run = 0;
        for (size_t i = 0; i < s.size(); ++i) {
            int b = base_index(s[i]);
            if (b < 0) { run = 0; fwd = rev = 0; continue; }
            fwd = ((fwd << 2) | (uint64_t)b) & spec.mask;
            rev = (rev >> 2) | ((uint64_t)(3 - b) << (2 * (k - 1)));
            if (++run >= k) {
                int w = (int)i - k + 1;
                solid[w] = spec.get(fwd, rev) >= minabund ? 1 : 0;
            }
        }
    }
    // try single substitutions at p in [plo, phi]: every run window in
    // [wlo, whi] must turn solid; apply iff exactly one (p, base) works
    auto fix_span = [&](int wlo, int whi, int plo, int phi) {
        int best_p = -1, best_b = -1, ncand = 0;
        for (int p = plo; p <= phi && ncand < 2; ++p) {
            int orig = base_index(s[p]);
            for (int nb = 0; nb < 4; ++nb) {
                if (nb == orig) continue;
                bool all_solid = true;
                for (int w = wlo; w <= whi; ++w) {
                    if (spec.window_count(s, w, p, nb) < minabund) {
                        all_solid = false;
                        break;
                    }
                }
                if (all_solid) {
                    ++ncand;
                    if (best_p < 0) { best_p = p; best_b = nb; }
                }
            }
        }
        if (ncand == 1) {  // unambiguous single-base repair
            s[best_p] = BASES[best_b];
            return true;
        }
        return false;
    };

    bool changed = false;
    int i = 0;
    while (i < P) {
        if (solid[i] != 0) { ++i; continue; }
        int j = i;
        while (j + 1 < P && solid[j + 1] == 0) ++j;
        // anchored? (interior runs need solid on both sides; edge runs one)
        bool left_ok = (i == 0) || solid[i - 1] == 1;
        bool right_ok = (j == P - 1) || solid[j + 1] == 1;
        if (j - i < k && left_ok && right_ok) {
            // one substitution can explain the whole run: error at some
            // p in [j, i+k-1] (the windows a substitution at p invalidates
            // are exactly [p-k+1, p])
            changed |= fix_span(i, j, j, std::min(i + k - 1,
                                                  (int)s.size() - 1));
        } else if (j - i >= k) {
            // multiple errors: repair the run's ends independently — the
            // leftmost error lies at some p in [i, i+k-1] and must fix the
            // affected run prefix [i, p]; symmetrically the rightmost error
            // is at p = j fixing [j-k+1, j].  Errors closer than k stay
            // (their shared windows can't all turn solid) — later passes
            // retry against the refreshed spectrum.
            bool did = false;
            // interior anchors pin BOTH error positions exactly: the
            // leftmost error is at i+k-1 (window i-1 solid, i weak) and the
            // rightmost at j (window j+1 solid, j weak) — a 9-combination
            // double-substitution search settles errors closer than k
            if (left_ok && right_ok && i > 0 && j < P - 1 &&
                j - i <= 2 * (k - 1)) {
                int p1 = i + k - 1, p2 = j;
                int o1 = base_index(s[p1]), o2 = base_index(s[p2]);
                int b1 = -1, b2 = -1, ncand = 0;
                for (int n1 = 0; n1 < 4 && ncand < 2; ++n1) {
                    if (n1 == o1) continue;
                    for (int n2 = 0; n2 < 4 && ncand < 2; ++n2) {
                        if (n2 == o2) continue;
                        bool all_solid = true;
                        for (int w = i; w <= j; ++w) {
                            if (spec.window_count(s, w, p1, n1, p2, n2)
                                    < minabund) {
                                all_solid = false;
                                break;
                            }
                        }
                        if (all_solid) {
                            ++ncand;
                            if (b1 < 0) { b1 = n1; b2 = n2; }
                        }
                    }
                }
                if (ncand == 1) {
                    s[p1] = BASES[b1];
                    s[p2] = BASES[b2];
                    did = changed = true;
                }
            }
            if (!did && left_ok) {
                for (int p = i + k - 1; p >= i && !did; --p)
                    did = fix_span(i, std::min(j, p), p, p);
            }
            if (!did && right_ok && j - k + 1 >= 0)
                changed |= fix_span(std::max(i, j - k + 1), j, j, j);
            changed |= did;
        }
        i = j + 1;
    }
    return changed;
}

// correct all reads in place against their joint spectrum, iterating until
// convergence (each pass's fixes reinforce true k-mers for the next);
// returns #reads changed in total
int spectral_correct(std::vector<std::string> &reads, int k,
                     uint32_t minabund) {
    int total = 0;
    for (int pass = 0; pass < 4; ++pass) {
        KmerSpectrum spec(k);
        for (const auto &s : reads) spec.add_read(s);
        int n = 0;
        for (auto &s : reads)
            if (spectral_correct_read(s, spec, minabund)) ++n;
        total += n;
        if (n == 0) break;
    }
    return total;
}

}  // namespace

extern "C" {

int kt_correct(const char **reads, int nreads, int k, int minabund,
               char *out, int out_cap) {
    std::vector<std::string> inputs;
    inputs.reserve(nreads);
    for (int i = 0; i < nreads; ++i) inputs.emplace_back(reads[i]);
    spectral_correct(inputs, k, (uint32_t)minabund);
    int pos = 0, n = 0;
    for (auto &s : inputs) {
        int need = (int)s.size() + 1;
        if (pos + need > out_cap) break;
        std::memcpy(out + pos, s.c_str(), need);
        pos += need;
        ++n;
    }
    return n;
}

int kt_assemble(const char **reads, int nreads, int min_overlap, char *out,
                int out_cap) {
    std::vector<Pileup> contigs;
    std::vector<std::string> inputs;
    inputs.reserve(nreads);
    for (int i = 0; i < nreads; ++i) {
        std::string s(reads[i]);
        if (!s.empty()) inputs.push_back(std::move(s));
    }
    // BFC-analog preprocessing (fermi-lite misc.c:275 runs bfc first).
    // With error-corrected input every window is already solid: a no-op.
    if ((int)inputs.size() >= 4) spectral_correct(inputs, 25, 2);
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
