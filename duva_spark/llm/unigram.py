"""Unigram-LM tokenizer training (Kudo 2018, "Subword Regularization";
the SentencePiece unigram trainer) as a bounded-iteration Spark loop —
the second production tokenizer family next to BPE (``llm/bpe.py``).

This is the hard-EM (Viterbi) variant: seed a candidate vocabulary from
weighted substring counts, then repeat ``rounds`` times — segment every
distinct word by Viterbi under the current piece log-probabilities
(E-step), recount pieces from the chosen segmentations, and re-estimate
Laplace-smoothed probabilities (M-step). Full EM marginalizes over all
segmentations (forward-backward); the Viterbi variant keeps the same
fixed-point structure with a deterministic, cross-engine-replayable
E-step — the property the DuckDB oracle needs.

Spark-first shape (the bpe_train contract):

- The corpus is scanned ONCE (the word-frequency groupBy reused from
  ``bpe.word_vocab``). Everything after operates on the Zipf-bounded
  distinct-word table.
- The seed vocabulary is ONE substring-explosion aggregate over that
  table, cut by a TakeOrderedAndProject (top ``n_seed`` multi-char
  pieces by count, ties to the lexicographically smallest) plus ALL
  single characters — guaranteeing every word stays segmentable.
- Per round: the ≤(n_seed + alphabet) piece log-probs ride to the
  executors (map literal in the fold form, pandas-UDF closure in the
  Arrow form); the E-step count is one vocab-bounded shuffle; driver
  state is V floats — the kcenter/kmeans/doremi bounded-iteration
  contract.

Execution paths (``impl=``): the Viterbi DP exists twice, value-
identical by construction and asserted against each other in tests —
'fold' (a pure ``F.aggregate`` Column fold: no UDF, no join, no
shuffle, but INTERPRETED per element — higher-order-function lambdas
fall out of codegen) and 'arrow' (mapInPandas kernels with the same
IEEE-double additions in the same order, plus a per-task word→count
memo on the encode leg). The r9 A/B at sf0.1 measured the full
train+encode chain at 28.6 s (fold) vs 2.1 s (arrow) min-of-2 — the
same ~15× the Gopher-repetition A/B found for the same construct
(``textstats.gopher_repetition_arrow``) — so 'arrow' is the default
and the fold is kept for the A/B reproduction and plan-shape tests.

Determinism spec (both engines replay it exactly):

- Seed counts and E-step counts are exact integers (occurrences
  weighted by word frequency).
- ``lp(p) = round(ln((c_p + 1) / (T + V)), 6)`` — Laplace smoothing
  keeps every vocab piece alive across rounds; the 6-dp round absorbs
  sub-ulp cross-engine ln() drift.
- Viterbi: ``best[i] = max_j best[j] + lp(w[j+1..i])`` over start
  positions ``j ∈ [max(0, i−max_len), i−1]``; the chosen predecessor
  is the SMALLEST j attaining the max (equivalently: the fold keeps a
  candidate only when strictly better, scanning j ascending). Score
  sums are the same left-to-right double additions on both engines, so
  the exact-equality backtrace the oracle uses picks the same path.

Reference parity: none — onaio/duva has no tokenizer surface
(app/core/importer.py is an ingest/export service); this extends the
beyond-reference LLM-pipeline inventory (SURVEY.md §2c) alongside BPE.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from duva_spark.llm.bpe import word_vocab
from duva_spark.llm.hashed_lm import round_half_up

_SENTINEL = -1e18


def substring_counts(words: DataFrame, max_len: int) -> DataFrame:
    """(piece, c): weighted occurrence counts of every substring of
    length 1..max_len over the word-frequency table (overlapping
    occurrences each count, weighted by word frequency). One explode +
    one map-side-combined groupBy over the vocab-bounded table."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda st: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_len), F.length("w") - st + 1)
                ),
                lambda ln: F.col("w").substr(st, ln),
            ),
        )
    )
    return (
        words.select("cnt", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("c"))
    )


def viterbi_segment(word: Column, vocab_map: Column, max_len: int) -> Column:
    """The word's max-likelihood segmentation under ``vocab_map``
    (piece → 6-dp log-prob) as ``array<string>`` — a single pure fold
    (``F.aggregate``) over character positions: state i carries
    (best score, best segment) for the prefix w[1..i]; candidates scan
    start positions j ascending and replace only when STRICTLY better,
    so the smallest j attaining the max wins (the rule the oracle's
    exact-equality backtrace reproduces). No UDF, no join, no shuffle."""
    n = F.length(word)
    init = F.array(
        F.struct(
            F.lit(0.0).alias("s"), F.array().cast("array<string>").alias("seg")
        )
    )
    sentinel = F.struct(
        F.lit(_SENTINEL).alias("s"), F.array().cast("array<string>").alias("seg")
    )

    def step(acc: Column, i: Column) -> Column:
        def cand(b: Column, j: Column) -> Column:
            piece = word.substr(j + 1, i - j)
            lpv = F.element_at(vocab_map, piece)
            st = F.element_at(acc, j + 1)
            cs = st["s"] + lpv
            better = lpv.isNotNull() & (cs > b["s"])
            return F.when(
                better,
                F.struct(
                    cs.alias("s"),
                    F.concat(st["seg"], F.array(piece)).alias("seg"),
                ),
            ).otherwise(b)

        best = F.aggregate(
            F.sequence(F.greatest(i - F.lit(max_len), F.lit(0)), i - 1),
            sentinel,
            cand,
        )
        return F.concat(acc, F.array(best))

    states = F.aggregate(F.sequence(F.lit(1), n), init, step)
    return F.element_at(states, n + 1)["seg"]


def viterbi_token_count(word: Column, vocab_map: Column, max_len: int) -> Column:
    """Number of pieces in the word's max-likelihood segmentation — the
    ``viterbi_segment`` fold with the DP state slimmed to
    (score, n_pieces): the strictly-better replace rule picks the same
    smallest-start predecessor chain, and each state has a unique chosen
    predecessor under it, so the count equals
    ``size(viterbi_segment(...))`` without carrying piece arrays
    through the fold. Unsegmentable words (impossible when the vocab
    was trained on the same corpus — every single char is a piece)
    yield 0."""
    n = F.length(word)
    init = F.array(
        F.struct(F.lit(0.0).alias("s"), F.lit(0).alias("np"))
    )
    sentinel = F.struct(F.lit(_SENTINEL).alias("s"), F.lit(0).alias("np"))

    def step(acc: Column, i: Column) -> Column:
        def cand(b: Column, j: Column) -> Column:
            piece = word.substr(j + 1, i - j)
            lpv = F.element_at(vocab_map, piece)
            st = F.element_at(acc, j + 1)
            cs = st["s"] + lpv
            better = lpv.isNotNull() & (cs > b["s"])
            return F.when(
                better, F.struct(cs.alias("s"), (st["np"] + 1).alias("np"))
            ).otherwise(b)

        best = F.aggregate(
            F.sequence(F.greatest(i - F.lit(max_len), F.lit(0)), i - 1),
            sentinel,
            cand,
        )
        return F.concat(acc, F.array(best))

    states = F.aggregate(F.sequence(F.lit(1), n), init, step)
    final = F.element_at(states, n + 1)
    return F.when(final["s"] > _SENTINEL / 2, final["np"]).otherwise(F.lit(0))


def _viterbi_count_py(word: str, lp: dict[str, float], max_len: int) -> int:
    """Python replica of the ``viterbi_token_count`` fold — EXACTLY the
    same IEEE-double additions in the same left-to-right order and the
    same strictly-better / smallest-start rule, so the two
    implementations are value-identical by construction (asserted
    against each other in tests and under the same oracle). Sentinel
    extensions never win: lp values are negative and ``-1e18 + lp``
    rounds back to -1e18 in double, which is not strictly greater than
    the -1e18 candidate floor — the same absorption the Column fold
    relies on."""
    n = len(word)
    s = [0.0] + [_SENTINEL] * n
    np_ = [0] * (n + 1)
    for i in range(1, n + 1):
        bs, bn = _SENTINEL, 0
        for j in range(max(0, i - max_len), i):
            lpv = lp.get(word[j:i])
            if lpv is not None:
                cs = s[j] + lpv
                if cs > bs:
                    bs, bn = cs, np_[j] + 1
        s[i], np_[i] = bs, bn
    return np_[n] if s[n] > _SENTINEL / 2 else 0


def _viterbi_seg_py(word: str, lp: dict[str, float], max_len: int) -> list[str]:
    """Python replica of the ``viterbi_segment`` fold (same contract as
    ``_viterbi_count_py``, carrying the chosen-predecessor chain
    instead of the count)."""
    n = len(word)
    s = [0.0] + [_SENTINEL] * n
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    for i in range(1, n + 1):
        bs, bj = _SENTINEL, None
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lpv = lp.get(piece)
            if lpv is not None:
                cs = s[j] + lpv
                if cs > bs:
                    bs, bj = cs, (j, piece)
        s[i] = bs
        back[i] = bj
    if back[n] is None:
        return []
    out: list[str] = []
    i = n
    while i > 0 and back[i] is not None:
        j, piece = back[i]
        out.append(piece)
        i = j
    out.reverse()
    return out


def estep_counts_arrow(
    words: DataFrame, lp: dict[str, float], max_len: int
) -> DataFrame:
    """(piece, c): one E-step recount over the word-frequency table as
    an Arrow kernel — each batch segments its distinct words in Python
    (dict lookups amortized across the batch) and emits PARTIAL piece
    counts, so the groupBy that follows shuffles ≤ vocab × partitions
    rows instead of the exploded piece stream. Value-identical to the
    ``viterbi_segment`` fold + explode + groupBy (the segmentation is
    the same DP; the sum is exact integers)."""
    import pandas as pd

    def kernel(batches):
        for pdf in batches:
            counts: dict[str, int] = {}
            for w, cnt in zip(pdf["w"], pdf["cnt"]):
                for piece in _viterbi_seg_py(w, lp, max_len):
                    counts[piece] = counts.get(piece, 0) + int(cnt)
            yield pd.DataFrame(
                {"piece": list(counts.keys()), "c": list(counts.values())}
            )

    partial = words.select("w", "cnt").mapInPandas(kernel, "piece string, c long")
    return partial.groupBy("piece").agg(F.sum("c").alias("c"))


def unigram_encode_counts_arrow(
    docs: DataFrame,
    lp: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 4,
    word_cap: int = 16,
) -> DataFrame:
    """The ``unigram_encode_counts`` census as an Arrow kernel
    (mapInPandas): one Python pass per document computes the EXACT
    INTEGER statistics (word/char/token counts) with a per-task
    word→token-count memo (Zipf makes most words repeats, so the DP
    runs once per distinct word per task, not once per occurrence);
    the division and rounding stay in the SAME Column tail as the fold
    form, so kernel and codegen are value-identical by construction.

    Rationale: the fold form's higher-order-function lambdas are
    INTERPRETED per element — the same construct the Gopher-repetition
    A/B measured at 15× slower than an Arrow kernel
    (``textstats.gopher_repetition_arrow``); this is the measured
    winner of the r9 A/B (the loser is kept as
    ``unigram_encode_counts`` for the plan-shape tests and the A/B
    reproduction). Same shuffle story: a pure per-row projection,
    embarrassingly parallel, no Exchange before the per-doc stats."""
    import pandas as pd

    id_dt = docs.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_dt}, n_words long, n_char_tokens long, n_unigram_tokens long"

    def kernel(batches):
        memo: dict[str, int] = {}
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str):
                    # NULL text: split(NULL) nulls the whole census in
                    # the fold form — emit the same
                    rows.append([did, None, None, None])
                    continue
                ws = [
                    w for w in text.split(" ") if w != "" and len(w) <= word_cap
                ]
                n_char = sum(len(w) for w in ws)
                n_uni = 0
                for w in ws:
                    c = memo.get(w)
                    if c is None:
                        c = _viterbi_count_py(w, lp, max_len)
                        memo[w] = c
                    n_uni += c
                rows.append([did, len(ws), n_char, n_uni])
            yield pd.DataFrame(
                rows,
                columns=[id_col, "n_words", "n_char_tokens", "n_unigram_tokens"],
            )

    raw = docs.select(id_col, text_col).mapInPandas(kernel, schema=schema)
    return raw.select(
        id_col,
        "n_words",
        "n_char_tokens",
        "n_unigram_tokens",
        F.when(
            F.col("n_char_tokens") > 0,
            F.round(F.col("n_unigram_tokens") * 1.0 / F.col("n_char_tokens"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("compression"),
    )


def fertility_counts_arrow(
    docs: DataFrame,
    rules: list[tuple[int, str, str, str, int]],
    lp: dict[str, float],
    group_col: str = "lang",
    text_col: str = "text",
    word_cap: int = 16,
    max_len: int = 4,
) -> DataFrame:
    """(group_col, nw, nc, nb, nu) per document — the trained-tokenizer
    head-to-head census (BPE char merges AND unigram Viterbi count per
    word) as ONE Arrow kernel pass with per-task word→count memos.

    r12 optimization: q_tokenizer_fertility_trained previously encoded
    every word occurrence through the nested greedy-merge folds plus
    the Viterbi fold — higher-order-function lambdas are INTERPRETED
    per element (the same construct the Gopher-repetition and
    unigram-encode A/Bs measured at 10-15× slower than an Arrow
    kernel), and the fold re-runs per OCCURRENCE where the memo runs
    once per distinct word per task (Zipf). Semantics replicated
    exactly: the BPE loop is the pinned-identical merge scan of
    ``bpe.encode_token_counts_arrow`` (training-order, greedy
    left-to-right merge-and-consume) and the unigram count is
    ``_viterbi_count_py`` (pinned identical to the fold in tests);
    word universe w != '' and len(w) <= word_cap, identical to the
    fold projection. Pinned value-identical to the fold form by
    tests/test_llm_ops.py::test_fertility_arrow_matches_fold."""
    import pandas as pd

    pairs = [(a, b, m) for _, a, b, m, _ in rules]
    g_dt = docs.schema[group_col].dataType.simpleString()
    schema = f"{group_col} {g_dt}, nw long, nc long, nb long, nu long"

    def kernel(batches):
        bmemo: dict[str, int] = {}
        umemo: dict[str, int] = {}

        def bpe_n(word: str) -> int:
            hit = bmemo.get(word)
            if hit is not None:
                return hit
            syms = list(word)
            for a, b, m in pairs:
                out = []
                i = 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        out.append(m)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            bmemo[word] = len(syms)
            return len(syms)

        def uni_n(word: str) -> int:
            hit = umemo.get(word)
            if hit is None:
                hit = _viterbi_count_py(word, lp, max_len)
                umemo[word] = hit
            return hit

        for pdf in batches:
            rows = []
            for g, text in zip(pdf[group_col], pdf[text_col]):
                if not isinstance(text, str):
                    # NULL text: split(NULL) nulls the whole census in
                    # the fold form — emit the same
                    rows.append([g, None, None, None, None])
                    continue
                ws = [
                    w for w in text.split(" ") if w != "" and len(w) <= word_cap
                ]
                rows.append(
                    [
                        g,
                        len(ws),
                        sum(len(w) for w in ws),
                        sum(bpe_n(w) for w in ws),
                        sum(uni_n(w) for w in ws),
                    ]
                )
            yield pd.DataFrame(
                rows, columns=[group_col, "nw", "nc", "nb", "nu"]
            )

    return docs.select(group_col, text_col).mapInPandas(kernel, schema=schema)


def unigram_encode_counts(
    docs: DataFrame,
    lp: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 4,
    word_cap: int = 16,
) -> DataFrame:
    """(id_col, n_words, n_char_tokens, n_unigram_tokens, compression):
    per-document token census under the trained unigram model ``lp``
    (piece → log-prob), the tokenizer-application dual of
    ``unigram_train`` (the ``bpe.encode_token_counts`` contract). Words
    longer than ``word_cap`` are excluded from the census — the same
    cap the trainer applies, so train and encode see one vocabulary
    universe. The whole encode is a PURE PROJECTION: the model is
    inlined as a map literal, each word runs the slim Viterbi fold,
    zero exchanges before the per-doc aggregate."""
    pieces = sorted(lp)
    # two array Literals, not CreateArray over 2*vocab literal nodes:
    # the optimizer re-walks the whole tree per AQE re-optimization and
    # the vocab runs to thousands of pieces (values identical)
    vocab_map = F.map_from_arrays(
        F.lit(list(pieces)), F.lit([lp[p] for p in pieces])
    )
    ws = F.filter(
        F.split(F.col(text_col), " "),
        lambda w: (w != "") & (F.length(w) <= word_cap),
    )
    per_word = F.transform(
        ws, lambda w: viterbi_token_count(w, vocab_map, max_len)
    )
    chars = F.transform(ws, lambda w: F.length(w))
    n_char = F.aggregate(chars, F.lit(0), lambda acc, v: acc + v)
    n_uni = F.aggregate(per_word, F.lit(0), lambda acc, v: acc + v)
    return docs.select(
        id_col,
        F.size(ws).cast("long").alias("n_words"),
        n_char.cast("long").alias("n_char_tokens"),
        n_uni.cast("long").alias("n_unigram_tokens"),
        # empty/whitespace-only doc: 0/0 is defined as 0.0 (the oracle's
        # LEFT JOIN + CASE twin), not NULL
        F.when(n_char > 0, F.round(n_uni * 1.0 / n_char, 6))
        .otherwise(F.lit(0.0))
        .alias("compression"),
    )


def unigram_trained_lp(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 4,
    n_seed: int = 48,
    rounds: int = 3,
    dp: int = 6,
    word_cap: int = 16,
    impl: str = "arrow",
) -> dict[str, float]:
    """Train and return the FINAL model (piece → log-prob re-estimated
    from the last E-step's counts) — what an encode pass applies."""
    pieces, counts, tt, vsz = unigram_train(
        docs, text_col, max_len, n_seed, rounds, dp, word_cap, impl=impl
    )
    return {
        p: round_half_up(math.log((counts.get(p, 0) + 1) / (tt + vsz)), dp)
        for p in pieces
    }


def unigram_train_encode(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 4,
    n_seed: int = 48,
    rounds: int = 3,
    dp: int = 6,
    word_cap: int = 16,
    impl: str = "arrow",
) -> DataFrame:
    """Train the unigram LM, then encode the corpus under the FINAL
    model (the probabilities re-estimated from the last E-step's
    counts — one Viterbi pass beyond training, exactly the oracle
    chain extended one round). ``impl`` picks the Viterbi execution
    path for BOTH phases: 'arrow' (mapInPandas kernels — the measured
    r9 A/B winner) or 'fold' (the interpreted ``F.aggregate`` Column
    form, kept for the A/B reproduction); the two are value-identical
    by construction."""
    lp = unigram_trained_lp(
        docs, text_col, max_len, n_seed, rounds, dp, word_cap, impl=impl
    )
    enc = unigram_encode_counts_arrow if impl == "arrow" else unigram_encode_counts
    return enc(docs, lp, id_col, text_col, max_len, word_cap)


def unigram_train(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 4,
    n_seed: int = 48,
    rounds: int = 3,
    dp: int = 6,
    word_cap: int = 16,
    impl: str = "arrow",
    words: DataFrame | None = None,
) -> tuple[list[str], dict[str, int], int, int]:
    """Train the unigram LM; returns (vocab pieces, final E-step counts,
    final total piece count T, vocab size V).

    Words longer than ``word_cap`` characters are excluded from
    training entirely (seed counts AND E-step) — the bounded-unroll cap
    the cross-engine oracle replays, and the SentencePiece-style
    max-length guard a production trainer carries anyway (URLs and
    base64 blobs otherwise flood the substring table).

    Driver state is the ≤(n_seed + alphabet) piece table per round (one
    bounded collect each — the kmeans contract); the corpus is scanned
    once, every round operates on the checkpointed word table.

    ``words`` (optional) is a prebuilt word-vocab frame — (w, cnt) with
    the SAME ``word_cap`` filter already applied. Grid callers that
    train several vocab sizes over one corpus (q_unigram_vocab_curve)
    build it once and share it, so the corpus word-count scan runs once
    instead of once per grid point (r12 verdict item 5)."""
    if words is None:
        words = (
            word_vocab(docs, text_col)
            .filter(F.length("w") <= word_cap)
            .localCheckpoint(eager=False)
        )
    sc = substring_counts(words, max_len)
    singles = sc.filter(F.length("piece") == 1)
    multis = (
        sc.filter(F.length("piece") >= 2)
        .orderBy(F.desc("c"), F.asc("piece"))
        .limit(n_seed)
    )
    seed_rows = singles.unionByName(multis).collect()
    pieces = sorted(r["piece"] for r in seed_rows)
    vsz = len(pieces)
    t0 = sum(int(r["c"]) for r in seed_rows)
    lp = {
        r["piece"]: round_half_up(math.log((int(r["c"]) + 1) / (t0 + vsz)), dp)
        for r in seed_rows
    }
    counts: dict[str, int] = {}
    tt = 0
    for _ in range(rounds):
        if impl == "arrow":
            rows = estep_counts_arrow(words, lp, max_len).collect()
        else:
            vocab_map = F.map_from_arrays(
                F.lit(list(pieces)), F.lit([lp[p] for p in pieces])
            )
            seg = viterbi_segment(F.col("w"), vocab_map, max_len)
            rows = (
                words.select("cnt", F.explode(seg).alias("piece"))
                .groupBy("piece")
                .agg(F.sum("cnt").alias("c"))
                .collect()
            )
        counts = {r["piece"]: int(r["c"]) for r in rows}
        tt = sum(counts.values())
        lp = {
            p: round_half_up(math.log((counts.get(p, 0) + 1) / (tt + vsz)), dp)
            for p in pieces
        }
    return pieces, counts, tt, vsz


def unigram_train_frame(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 4,
    n_seed: int = 48,
    rounds: int = 3,
    k_out: int = 20,
    dp: int = 6,
    word_cap: int = 16,
    impl: str = "arrow",
) -> DataFrame:
    """The trained vocabulary's top ``k_out`` pieces as a DataFrame
    (piece, cnt, prob) — cnt the final Viterbi-count, prob the smoothed
    probability rounded to ``dp``; ordered by (cnt DESC, piece ASC),
    built from the bounded driver loop (the kcenter_frame pattern)."""
    spark = docs.sparkSession
    _, counts, tt, vsz = unigram_train(
        docs, text_col, max_len, n_seed, rounds, dp, word_cap, impl=impl
    )
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k_out]
    rows = [
        (p, int(c), round_half_up((c + 1) / (tt + vsz), dp)) for p, c in top
    ]
    return spark.createDataFrame(rows, "piece string, cnt long, prob double")


def unigram_prune_report(
    docs: DataFrame,
    text_col: str = "text",
    max_len: int = 4,
    n_seed: int = 48,
    rounds: int = 3,
    dp: int = 6,
    word_cap: int = 16,
    prune_permille: int = 1,
    impl: str = "arrow",
) -> DataFrame:
    """Count-based vocabulary prune — the prune DIRECTION of Kudo
    2018 §3.2 (SentencePiece iterates train→prune until the target
    vocab size), with the documented simplification that pieces are
    dropped by final-model USAGE (Viterbi-count share of token mass
    < prune_permille/1000) instead of Kudo's per-piece likelihood
    loss: usage is already exact and cross-engine-replayable, while
    the loss rule needs a second forward pass per candidate.
    Single-char pieces are never pruned (every word must stay
    segmentable — the SentencePiece invariant).

    Returns the before/after audit: (variant, vocab_size,
    total_tokens, tokens_per_word) for 'full' (segmentation under the
    final trained model) and 'pruned' (survivor model renormalized
    from the same final counts, one more slim-fold segmentation).
    Driver state stays <= V floats; the corpus is scanned once by the
    trainer, the prune itself is pure driver arithmetic on the final
    count table, and the pruned pass is one vocab-bounded job."""
    spark = docs.sparkSession
    # rounds+1: the extra round segments under the FINAL model, so the
    # 'full' row prices what an encode pass actually produces
    pieces, counts_full, tt_full, vsz = unigram_train(
        docs, text_col, max_len, n_seed, rounds + 1, dp, word_cap, impl=impl
    )
    surv = [
        p
        for p in pieces
        if len(p) == 1
        or counts_full.get(p, 0) * 1000 >= tt_full * prune_permille
    ]
    t_mass = sum(counts_full.get(p, 0) for p in surv)
    v_p = len(surv)
    lp_p = {
        p: round_half_up(
            math.log((counts_full.get(p, 0) + 1) / (t_mass + v_p)), dp
        )
        for p in surv
    }
    words = word_vocab(docs, text_col).filter(F.length("w") <= word_cap)
    if impl == "arrow":
        import pandas as pd

        def kernel(batches):
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "cnt": pdf["cnt"],
                        "tc": [
                            _viterbi_count_py(w, lp_p, max_len) for w in pdf["w"]
                        ],
                    }
                )

        per_word = words.select("w", "cnt").mapInPandas(
            kernel, "cnt long, tc long"
        )
        tot = per_word.select(
            F.sum(F.col("cnt") * F.col("tc")).alias("t"),
            F.sum("cnt").alias("wocc"),
        ).collect()[0]
    else:
        vocab_map = F.map_from_arrays(
            F.lit(sorted(lp_p)), F.lit([lp_p[p] for p in sorted(lp_p)])
        )
        tot = words.select(
            F.sum(
                F.col("cnt") * viterbi_token_count(F.col("w"), vocab_map, max_len)
            ).alias("t"),
            F.sum("cnt").alias("wocc"),
        ).collect()[0]
    t_pruned, wocc = int(tot["t"]), int(tot["wocc"])
    rows = [
        ("full", vsz, tt_full, round_half_up(tt_full * 1.0 / wocc, dp)),
        ("pruned", v_p, t_pruned, round_half_up(t_pruned * 1.0 / wocc, dp)),
    ]
    return spark.createDataFrame(
        rows, "variant string, vocab_size long, total_tokens long, tokens_per_word double"
    )
