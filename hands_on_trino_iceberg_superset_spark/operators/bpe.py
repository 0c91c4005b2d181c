"""BPE tokenizer training AND encoding (Sennrich et al. 2016,
arXiv:1508.07909) — the tokenizer a training-data pipeline learns
from, then runs over, the corpus.

Spark-first shape — and the honest 100 TB cost model:

1. The corpus collapses to a **word-frequency table** once (one
   shuffle). This is the classic BPE trick: merges depend only on
   (distinct word, count), so 100 TB of text becomes ~10^7-10^8
   weighted rows. This is the ONLY corpus-sized stage of training.
2. BPE *state* is vocab-sized, and the merge loop is inherently
   serial (each round's argmax depends on the previous merge) — so
   the right engine for the loop is chosen by DATA VOLUME, not
   dogma. :func:`bpe_train` volume-routes exactly like
   ``ngram_jaccard_pairs_auto``:

   - **driver route** (word table <= ``driver_max_words``, the
     common case — even a 100 TB web corpus has ~10^8 distinct
     words, a few GB): collect (word, freq) once and run the exact
     incremental-pair-count algorithm in memory (pair->word inverted
     index, delta updates per merge — the subword-nmt shape). 16
     merges cost milliseconds instead of 16 x (shuffle + argmax
     collect + re-cache) Spark jobs. This is what production
     tokenizer trainers do: distributed word count, in-memory merge
     loop.
   - **distributed route** (word table too big to collect): the
     per-round JVM pipeline — codegen'd adjacent-pair count, 1-row
     argmax collect, expression-fold merge application on the cached
     word table, re-materialized per round so lineage stays one map
     deep. Correct at any vocab size; pays ~3 Spark jobs per merge.

   Both routes learn the IDENTICAL merge table (same counts, same
   count-desc / (a, b)-asc tie-break); tests/test_curation.py runs
   the differential on both.
3. **Encoding** (:func:`bpe_encode`) replays the learned merges over
   each word left-to-right in rank order — equivalent to min-rank
   iterative merging because a merge's operands always predate it in
   rank order. One Arrow-batched ``mapInPandas`` pass, embarrassingly
   parallel, with a per-batch word->tokens memo so each distinct
   word in a batch is encoded once.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: marks end-of-word so a word-final symbol can't merge across words
END = "</w>"

#: above this many distinct words the trainer stays distributed;
#: below it the (word, freq) table collects to the driver. 2M rows
#: x ~50 bytes is ~100 MB of driver memory — far under any sane
#: driver heap, far over any natural-language vocabulary.
DRIVER_MAX_WORDS = 2_000_000


def word_frequency(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace tokens — the one corpus-sized
    shuffle of BPE training."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _merge_word(
    syms: tuple[str, ...], a: str, b: str
) -> tuple[str, ...]:
    """Left-to-right non-overlapping replacement of adjacent (a, b)
    with a||b — the reference algorithm's merge_vocab scan."""
    out: list[str] = []
    i, n, merged = 0, len(syms), a + b
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _train_driver(
    word_freqs: list[tuple[str, int]],
    n_merges: int,
    min_pair_count: int,
) -> list[dict]:
    """Exact in-memory BPE with incremental pair-count maintenance:
    a pair -> containing-word inverted index means each merge
    touches only the words it occurs in (delta-updates the global
    counts) instead of rescanning the vocabulary — the subword-nmt
    ``learn_bpe`` shape. Identical output to the naive
    recount-per-round reference by construction (deltas preserve the
    exact counts)."""
    words: list[tuple[tuple[str, ...], int]] = [
        (tuple(list(w) + [END]), f) for w, f in word_freqs
    ]
    stats: Counter = Counter()
    index: defaultdict = defaultdict(set)
    for wid, (syms, f) in enumerate(words):
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            stats[p] += f
            index[p].add(wid)
    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        if not stats:
            break
        top = max(stats.values())
        if top < min_pair_count:
            break
        best = min(p for p, c in stats.items() if c == top)
        a, b = best
        merges.append({
            "rank": rank,
            "left_sym": a,
            "right_sym": b,
            "merged": a + b,
            "pair_count": int(top),
        })
        for wid in list(index[best]):
            syms, f = words[wid]
            new = _merge_word(syms, a, b)
            if new == syms:
                continue
            old_pairs = Counter(zip(syms, syms[1:]))
            new_pairs = Counter(zip(new, new[1:]))
            for p, k in old_pairs.items():
                stats[p] -= k * f
                if stats[p] == 0:
                    del stats[p]
            for p, k in new_pairs.items():
                stats[p] += k * f
            for p in old_pairs:
                if p not in new_pairs:
                    index[p].discard(wid)
            for p in new_pairs:
                if p not in old_pairs:
                    index[p].add(wid)
            words[wid] = (new, f)
    return merges


# ------------------------------------------------- distributed route


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word -> its character sequence plus the end-of-word marker."""
    return words.select(
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("symbols"),
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts — overlapping occurrences count,
    exactly like the reference algorithm's get_stats."""
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("symbols") - 2),
        lambda i: F.struct(
            F.element_at("symbols", i + 1).alias("a"),
            F.element_at("symbols", i + 2).alias("b"),
        ),
    )
    return (
        symbols.where(F.size("symbols") >= 2)
        .select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def _apply_merge(symbols_col, a: str, b: str):
    """Left-to-right non-overlapping replacement of adjacent (a, b)
    with a||b, as a fold: a just-merged element (a||b) can never
    itself equal ``a`` (b is non-empty), so the fold's look-back-one
    rule is exactly the reference's scan-and-skip."""
    merged = a + b
    return F.aggregate(
        symbols_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _train_distributed(
    words: DataFrame, n_merges: int, min_pair_count: int
) -> list[dict]:
    """One merge per round on the cached distributed word table —
    the huge-vocab fallback (see module docstring, route 2)."""
    symbols = _initial_symbols(words).cache()
    symbols.count()  # materialize round 0
    merges: list[dict] = []
    try:
        for rank in range(1, n_merges + 1):
            best = (
                _pair_counts(symbols)
                .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            if not best or best[0].pair_count < min_pair_count:
                break
            a, b, cnt = best[0].a, best[0].b, int(best[0].pair_count)
            merges.append({
                "rank": rank,
                "left_sym": a,
                "right_sym": b,
                "merged": a + b,
                "pair_count": cnt,
            })
            nxt = symbols.select(
                "freq", _apply_merge(F.col("symbols"), a, b).alias("symbols")
            ).cache()
            nxt.count()  # materialize: keeps lineage one map deep
            symbols.unpersist()
            symbols = nxt
    finally:
        symbols.unpersist()
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    driver_max_words: int = DRIVER_MAX_WORDS,
) -> list[dict]:
    """Learn ``n_merges`` BPE merges over ``docs``. Returns the merge
    table as a list of dicts (rank, left_sym, right_sym, merged,
    pair_count) — driver-sized by construction (one row per merge).

    Volume-routed (see module docstring): the word-frequency table
    collects to the driver when it fits (exact in-memory loop), else
    the per-round distributed pipeline runs. Both routes are exact
    and deterministic: the argmax tie-breaks on (count desc, left
    asc, right asc), so the learned tokenizer is identical on every
    run, engine, and route. Stops early when no pair reaches
    ``min_pair_count``.
    """
    wf = word_frequency(docs, text_col).persist()
    try:
        # a count() aggregate decides the route without shipping a
        # single row: probing with limit(max+1).collect() would
        # materialize millions of driver-side Row objects just to
        # discover the table is too big, then throw them away
        if wf.count() <= driver_max_words:
            return _train_driver(
                [(r.word, int(r.freq)) for r in wf.collect()],
                n_merges,
                min_pair_count,
            )
        return _train_distributed(wf, n_merges, min_pair_count)
    finally:
        wf.unpersist()


def bpe_train_df(
    docs: DataFrame, n_merges: int, text_col: str = "text"
) -> DataFrame:
    """:func:`bpe_train` as a DataFrame (rank, left_sym, right_sym,
    merged, pair_count) for the query inventory."""
    spark = docs.sparkSession
    merges = bpe_train(docs, n_merges, text_col)
    schema = ("rank int, left_sym string, right_sym string, "
              "merged string, pair_count bigint")
    if not merges:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        [(m["rank"], m["left_sym"], m["right_sym"], m["merged"],
          m["pair_count"]) for m in merges],
        schema,
    )


# ------------------------------------------------------- vocabulary


def bpe_base_alphabet(docs: DataFrame, text_col: str = "text") -> list[str]:
    """Sorted distinct characters of the corpus's words (plus the
    END marker) — the base tier of the vocabulary. One distributed
    distinct over characters (alphabet-sized result)."""
    rows = (
        docs.select(
            F.explode(
                F.split(
                    F.regexp_replace(F.col(text_col), " ", ""), ""
                )
            ).alias("ch")
        )
        .where(F.col("ch") != "")
        .distinct()
        .collect()
    )
    return sorted({r.ch for r in rows} | {END})


def bpe_vocab(
    merges: list[dict], base_alphabet: list[str]
) -> dict[str, int]:
    """token -> id, the artifact a trained tokenizer ships: sorted
    base symbols first (stable ids for the alphabet), then one entry
    per merge in rank order — deterministic given (corpus, merges),
    exactly how production BPE vocabularies are numbered."""
    vocab: dict[str, int] = {}
    for ch in sorted(set(base_alphabet)):
        vocab[ch] = len(vocab)
    for m in sorted(merges, key=lambda m: m["rank"]):
        tok = m["merged"]
        if tok not in vocab:
            vocab[tok] = len(vocab)
    return vocab


def bpe_encode_ids(
    docs: DataFrame,
    merges: list[dict],
    vocab: dict[str, int],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`bpe_encode` to INTEGER token ids — the actual training
    input format. ONE Arrow-batched map pass with the (vocab-sized)
    id table in the task closure: no explode, no join, no shuffle —
    tokenizing 100 TB stays embarrassingly parallel. Unknown tokens
    (impossible when ``vocab`` came from :func:`bpe_vocab` over the
    same corpus+merges) map to -1 rather than raising, so a stale
    vocab is visible in the data, not a mid-job crash."""
    import pandas as pd

    pairs = [
        (m["left_sym"], m["right_sym"])
        for m in sorted(merges, key=lambda m: m["rank"])
    ]
    vmap = dict(vocab)
    id_type = docs.schema[id_col].dataType.simpleString()

    def run(batches):
        for pdf in batches:
            memo: dict[str, list[int]] = {}
            ids, out = [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                tids: list[int] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    got = memo.get(w)
                    if got is None:
                        memo[w] = got = [
                            vmap.get(t, -1)
                            for t in encode_word(w, pairs)
                        ]
                    tids.extend(got)
                ids.append(did)
                out.append(tids)
            yield pd.DataFrame({id_col: ids, "token_ids": out})

    return docs.select(id_col, text_col).mapInPandas(
        run, f"{id_col} {id_type}, token_ids array<int>"
    )


# ------------------------------------------------------------ encode


def encode_word(word: str, pairs: list[tuple[str, str]]) -> tuple:
    """Tokenize one word by replaying the learned merges in rank
    order (chars + END marker, then each merge left-to-right
    non-overlapping). Rank-order replay equals iterative min-rank
    merging: a merge's operands are base chars or outputs of
    LOWER-ranked merges, so no later merge can ever create a pair an
    earlier merge consumes."""
    syms = tuple(list(word) + [END])
    for a, b in pairs:
        if len(syms) < 2:
            break
        syms = _merge_word(syms, a, b)
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a learned merge table — the APPLY
    half of the tokenizer (the pipeline step that turns curated text
    into training tokens).

    One Arrow-batched ``mapInPandas`` pass: no shuffle, scales
    linearly with executors; a per-batch word->tokens memo encodes
    each distinct word once per batch (natural-language batches
    repeat words heavily). Emits per document:

    - ``tokens``     — the BPE token stream (END-marked words);
    - ``n_tokens``   — its length;
    - ``n_words``    — words encoded (= END markers emitted), and
    - ``n_chars``    — characters reconstructed from the tokens
      (token lengths minus each word's END marker) — conservation
      laws: they must equal the whitespace word count / non-space
      char count of the raw text, which is how the DuckDB oracle
      checks this path end-to-end without re-implementing BPE.
    """
    import pandas as pd

    pairs = [
        (m["left_sym"], m["right_sym"])
        for m in sorted(merges, key=lambda m: m["rank"])
    ]
    end_len = len(END)

    def run(batches):
        for pdf in batches:
            memo: dict[str, tuple] = {}
            ids, toks_col, n_toks, n_words_col, n_chars_col = (
                [], [], [], [], []
            )
            for did, text in zip(pdf[id_col], pdf[text_col]):
                tokens: list[str] = []
                n_words = 0
                n_chars = 0
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    toks = memo.get(w)
                    if toks is None:
                        memo[w] = toks = encode_word(w, pairs)
                    tokens.extend(toks)
                    n_words += 1
                    n_chars += sum(map(len, toks)) - end_len
                ids.append(did)
                toks_col.append(tokens)
                n_toks.append(len(tokens))
                n_words_col.append(n_words)
                n_chars_col.append(n_chars)
            yield pd.DataFrame({
                id_col: ids,
                "tokens": toks_col,
                "n_tokens": n_toks,
                "n_words": n_words_col,
                "n_chars": n_chars_col,
            })

    # carry the id column's REAL type through (doc ids may be
    # strings/uuids, not just longs)
    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        run,
        f"{id_col} {id_type}, tokens array<string>, n_tokens int, "
        "n_words int, n_chars long",
    )
