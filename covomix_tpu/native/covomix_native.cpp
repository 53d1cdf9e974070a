// covomix_native — C++ runtime helpers for the TPU framework.
//
// TPU-native equivalents of the reference's native components (SURVEY §2.5):
//   * levenshtein        — edit distance over token-id sequences (replaces the
//                          jiwer dependency of covomix/util/inference.py:345
//                          and fairseq's libnat edit_dist.cpp capability)
//   * batch_by_size      — length-bucketed batch construction (replaces
//                          fairseq/data/data_utils_fast.pyx)
//   * pad_batch_f32/i32  — fused copy+pad of ragged rows into a static-shape
//                          batch buffer (collate hot path, avoids per-row
//                          numpy dispatch)
//   * balanced_assignment_f32 — balanced token->expert routing via the
//                          Bertsekas auction algorithm (capability of
//                          fairseq/clib/libbase/balanced_assignment.cpp, the
//                          BASE-layer EP router; independent implementation)
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <limits>
#include <numeric>
#include <vector>

extern "C" {

// Edit distance between int64 sequences a[0:na], b[0:nb].
int64_t levenshtein_i64(const int64_t* a, int64_t na, const int64_t* b, int64_t nb) {
    if (na == 0) return nb;
    if (nb == 0) return na;
    std::vector<int64_t> prev(nb + 1), cur(nb + 1);
    for (int64_t j = 0; j <= nb; ++j) prev[j] = j;
    for (int64_t i = 1; i <= na; ++i) {
        cur[0] = i;
        const int64_t ai = a[i - 1];
        for (int64_t j = 1; j <= nb; ++j) {
            const int64_t sub = prev[j - 1] + (ai != b[j - 1]);
            cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, sub});
        }
        std::swap(prev, cur);
    }
    return prev[nb];
}

// Batched edit distance: flat_a/flat_b hold concatenated sequences with
// offsets (len n+1). out[i] = dist(a_i, b_i).
void levenshtein_batch_i64(const int64_t* flat_a, const int64_t* off_a,
                           const int64_t* flat_b, const int64_t* off_b,
                           int64_t n, int64_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        out[i] = levenshtein_i64(flat_a + off_a[i], off_a[i + 1] - off_a[i],
                                 flat_b + off_b[i], off_b[i + 1] - off_b[i]);
    }
}

// Length-bucketed batching (fairseq batch_by_size semantics): indices must be
// pre-sorted by length. Packs consecutive indices into batches such that
//   batch_size <= max_sentences  and  max_len_in_batch * batch_size <= max_tokens.
// Writes batch boundaries into out_boundaries (capacity n+1); returns count.
int64_t batch_by_size(const int64_t* lengths, const int64_t* indices, int64_t n,
                      int64_t max_tokens, int64_t max_sentences,
                      int64_t* out_boundaries) {
    if (n <= 0) return 0;  // out_boundaries capacity is n+1; no tail write
    int64_t num_batches = 0;
    int64_t start = 0;
    int64_t max_len = 0;
    out_boundaries[0] = 0;
    for (int64_t i = 0; i < n; ++i) {
        const int64_t len = lengths[indices[i]];
        const int64_t new_max = std::max(max_len, len);
        const int64_t bsz = i - start + 1;
        const bool overflow =
            (max_sentences > 0 && bsz > max_sentences) ||
            (max_tokens > 0 && new_max * bsz > max_tokens);
        if (overflow && bsz > 1) {
            out_boundaries[++num_batches] = i;
            start = i;
            max_len = len;
        } else {
            max_len = new_max;
        }
    }
    out_boundaries[++num_batches] = n;
    return num_batches;
}

// Copy ragged float32 rows (flat + offsets, row width `dim`) into a padded
// [n, max_len, dim] buffer pre-filled by the caller.
void pad_batch_f32(const float* flat, const int64_t* offsets, int64_t n,
                   int64_t dim, int64_t max_len, float* out) {
    for (int64_t i = 0; i < n; ++i) {
        const int64_t t = std::min((offsets[i + 1] - offsets[i]) / dim, max_len);
        std::memcpy(out + i * max_len * dim, flat + offsets[i], t * dim * sizeof(float));
    }
}

void pad_batch_i32(const int32_t* flat, const int64_t* offsets, int64_t n,
                   int64_t dim, int64_t max_len, int32_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const int64_t t = std::min((offsets[i + 1] - offsets[i]) / dim, max_len);
        std::memcpy(out + i * max_len * dim, flat + offsets[i], t * dim * sizeof(int32_t));
    }
}

// Balanced linear assignment of T tokens to E experts (E divides T), each
// expert receiving exactly k = T/E tokens, approximately maximizing the total
// affinity. Gauss-Seidel auction (Bertsekas): unfilled experts repeatedly bid
// token price increments for their best-value tokens; an outbid expert
// releases the token and re-enters the queue. eps-optimal with
// eps = max((smax - smin)/50, 1e-4); bounded iterations with a greedy
// fill-in fallback so the call always terminates with a balanced assignment.
//
// scores: [T, E] row-major token->expert affinity. out_expert: [T] expert id.
void balanced_assignment_f32(const float* scores, int64_t T, int64_t E,
                             int64_t* out_expert) {
    const int64_t k = T / E;
    float smax = scores[0], smin = scores[0];
    for (int64_t i = 0; i < T * E; ++i) {
        smax = std::max(smax, scores[i]);
        smin = std::min(smin, scores[i]);
    }
    const float eps = std::max((smax - smin) / 50.0f, 1e-4f);

    std::vector<float> cost(T, 0.0f);
    std::vector<int64_t> owner(T, -1);
    std::vector<int64_t> need(E, k);
    std::vector<int64_t> queue(E);
    std::iota(queue.begin(), queue.end(), 0);

    std::vector<int64_t> cand(T);
    const int64_t max_rounds = 2000 * E;
    int64_t rounds = 0;
    size_t qh = 0;  // queue head (ring)
    while (qh < queue.size() && rounds++ < max_rounds) {
        const int64_t e = queue[qh++];
        int64_t m = need[e];
        if (m <= 0) continue;
        // candidates: tokens not already owned by e, by value = score - cost
        int64_t nc = 0;
        for (int64_t t = 0; t < T; ++t)
            if (owner[t] != e) cand[nc++] = t;
        auto value = [&](int64_t t) { return scores[t * E + e] - cost[t]; };
        const int64_t take = std::min(m, nc);
        const int64_t sel = std::min(take + 1, nc);
        std::partial_sort(cand.begin(), cand.begin() + sel, cand.begin() + nc,
                          [&](int64_t a, int64_t b) { return value(a) > value(b); });
        // when every candidate is taken (nc == take) the runner-up must LOWER
        // bound all current candidate values so bids stay positive (prices
        // monotone non-decreasing — the auction's eps-optimality invariant;
        // matches the numpy fallback's value.min() - 1)
        float runner_up;
        if (nc > take) {
            runner_up = value(cand[take]);
        } else {
            runner_up = std::numeric_limits<float>::infinity();
            for (int64_t j = 0; j < nc; ++j)
                runner_up = std::min(runner_up, value(cand[j]));
            runner_up -= 1.0f;
        }
        for (int64_t j = 0; j < take; ++j) {
            const int64_t t = cand[j];
            const float bid = value(t) - runner_up + eps;
            const int64_t prev = owner[t];
            owner[t] = e;
            need[e]--;
            cost[t] += bid;
            if (prev >= 0) {
                need[prev]++;
                queue.push_back(prev);
            }
        }
        if (need[e] > 0) queue.push_back(e);
    }
    // fill-in fallback (only reachable if max_rounds hit): give unfilled
    // experts their best remaining unowned tokens
    for (int64_t e = 0; e < E; ++e) {
        while (need[e] > 0) {
            int64_t best = -1;
            for (int64_t t = 0; t < T; ++t)
                if (owner[t] < 0 && (best < 0 || scores[t * E + e] > scores[best * E + e]))
                    best = t;
            if (best < 0) break;
            owner[best] = e;
            need[e]--;
        }
    }
    for (int64_t t = 0; t < T; ++t) out_expert[t] = owner[t];
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Corpus BLEU accumulation (capability of fairseq/clib/libbleu/libbleu.cpp:
// pad/eos trimming, clipped 1..4-gram matches accumulated into a running
// stat). Independent implementation: exact ngram keys via std::map over token
// tuples instead of FNV hashing (no collision false-matches).

#include <map>
#include <array>

namespace {

using Ngram = std::array<int64_t, 4>;

void trim(const int64_t** sent, int64_t* len, int64_t pad, int64_t eos) {
    // left-trim pad, right-trim pad/eos (libbleu.cpp bleu_trim semantics)
    while (*len > 0 && (*sent)[0] == pad) { ++*sent; --*len; }
    while (*len > 1 && ((*sent)[*len - 1] == pad || (*sent)[*len - 1] == eos)) --*len;
    if (*len == 1 && ((*sent)[0] == pad || (*sent)[0] == eos)) *len = 0;
}

void add_ngrams(int64_t n, const int64_t* ref, int64_t reflen,
                const int64_t* pred, int64_t predlen,
                int64_t* total, int64_t* match) {
    if (predlen < n) return;
    const int64_t np = predlen - n + 1;
    *total += np;
    if (reflen < n) return;
    const int64_t nr = reflen - n + 1;
    std::map<Ngram, int64_t> count;
    for (int64_t i = 0; i < np; ++i) {
        Ngram g{0, 0, 0, 0};
        for (int64_t j = 0; j < n; ++j) g[j] = pred[i + j];
        ++count[g];
    }
    for (int64_t i = 0; i < nr; ++i) {
        Ngram g{0, 0, 0, 0};
        for (int64_t j = 0; j < n; ++j) g[j] = ref[i + j];
        auto it = count.find(g);
        if (it != count.end() && it->second > 0) { ++*match; --it->second; }
    }
}

}  // namespace

extern "C" {

// stat: int64[10] = [reflen, predlen, count1, match1, ..., count4, match4],
// accumulated in place (caller zero- or one-initializes).
void bleu_add_i64(int64_t* stat, const int64_t* ref, int64_t reflen,
                  const int64_t* pred, int64_t predlen, int64_t pad, int64_t eos) {
    trim(&ref, &reflen, pad, eos);
    trim(&pred, &predlen, pad, eos);
    stat[0] += reflen;
    stat[1] += predlen;
    for (int64_t n = 1; n <= 4; ++n)
        add_ngrams(n, ref, reflen, pred, predlen, &stat[2 * n], &stat[2 * n + 1]);
}

// ---------------------------------------------------------------------------
// Token-block slicing (capability of fairseq/data/token_block_utils_fast.pyx):
// map per-sequence sizes to [start, end) slices over the flattened token
// stream. mode: 0=none (fixed blocks), 1=complete (whole sentences up to
// block_size), 2=complete_doc (document_sep_len-sized rows end a document;
// blocks of >1 token within documents), 3=eos (one slice per sentence).
// out must have capacity 2 * (n + total/block_size + 2); returns #slices.
int64_t token_block_slices(const int64_t* sizes, int64_t n, int64_t block_size,
                           int64_t mode, int64_t document_sep_len, int64_t* out) {
    int64_t m = 0;
    if (mode == 0) {
        int64_t total = 0;
        for (int64_t i = 0; i < n; ++i) total += sizes[i];
        for (int64_t s = 0; s < total; s += block_size) {
            out[2 * m] = s;
            out[2 * m + 1] = std::min(s + block_size, total);
            ++m;
        }
    } else if (mode == 1 || mode == 2) {
        int64_t tok = 0, cur = 0, i = 0;
        const int64_t min_keep = (mode == 2) ? 2 : 1;  // complete_doc keeps >1
        while (i < n) {
            const bool doc_sep = (mode == 2) && sizes[i] == document_sep_len;
            if ((cur + sizes[i] <= block_size || cur == 0) && !doc_sep) {
                cur += sizes[i];
                ++i;
            } else {
                if (cur >= min_keep) { out[2 * m] = tok; out[2 * m + 1] = tok + cur; ++m; }
                tok += cur;
                cur = 0;
                if (doc_sep) { tok += sizes[i]; ++i; }
            }
        }
        if (cur >= min_keep) { out[2 * m] = tok; out[2 * m + 1] = tok + cur; ++m; }
    } else {  // eos: one slice per sequence
        int64_t tok = 0;
        for (int64_t i = 0; i < n; ++i) {
            out[2 * m] = tok;
            out[2 * m + 1] = tok + sizes[i];
            tok += sizes[i];
            ++m;
        }
    }
    return m;
}

// For each slice [s, e): (start_ds_idx, start_offset, end_ds_idx) into the
// per-sequence dataset (token_block_utils_fast.pyx DatasetSearcher semantics).
// Slices must be non-decreasing in start (they are, by construction).
void block_to_dataset_index(const int64_t* sizes, int64_t n,
                            const int64_t* slices, int64_t m, int64_t* out) {
    std::vector<int64_t> cum(n + 1, 0);
    for (int64_t i = 0; i < n; ++i) cum[i + 1] = cum[i] + sizes[i];
    int64_t ds = 0;
    // Matches the pyx DatasetSearcher: a flat index landing exactly on a
    // sequence boundary stays on the first sequence starting there (including
    // zero-length ones) rather than skipping to the first non-empty.
    auto seek = [&](int64_t flat) {
        while (ds + 1 < n && cum[ds + 1] <= flat && cum[ds] < flat) ++ds;
        return ds;
    };
    for (int64_t i = 0; i < m; ++i) {
        const int64_t s = slices[2 * i], e = slices[2 * i + 1];
        const int64_t sd = seek(s);
        out[3 * i] = sd;
        out[3 * i + 1] = s - cum[sd];
        out[3 * i + 2] = (e <= s) ? sd : seek(e - 1);
    }
}

}  // extern "C"
