"""WordPiece tokenizer: likelihood-scored merge training + greedy
longest-match-first apply (Schuster & Nakajima 2012, "Japanese and
Korean voice search"; the BERT tokenizer of Devlin et al. 2019).

WordPiece differs from BPE (:mod:`temporalscope_spark.operators.bpe`)
in exactly two places, and shares everything else:

* **training** picks the merge maximizing ``score = freq(a,b) /
  (freq(a) * freq(b))`` — the pair whose merge most increases corpus
  likelihood under a unigram model — instead of raw pair frequency;
* **apply** is greedy longest-match-first over the FINAL vocabulary
  (not a replay of the merge sequence): at each position the longest
  vocabulary piece matching the remaining suffix is taken, non-initial
  pieces carry the ``##`` continuation marker, and a word with an
  unmatchable position — or longer than ``max_chars`` — becomes
  ``[UNK]`` (the BERT tokenizer's ``max_input_chars_per_word`` rule).

Scale design mirrors the BPE module: the corpus collapses ONCE into the
bounded distinct-word table; every training round is one weighted pair
aggregation + one symbol-frequency aggregation + a 1-row argmax + the
islands+parity merge rewrite (``bpe._apply_merge`` with the ``##``
strip rule). The longest-match apply runs ``max_chars`` fixed rounds of
pure in-row array expressions over the SAME bounded word table, with
the piece inventory carried as a 1-row array cross-join (vocabulary-
sized — ~300 KB at a production 30k-piece vocab; a trie-shaped
broadcast join would replace the in-row scan at much larger vocabs).
The corpus itself is touched exactly twice — positional word explode,
word→tokens join — identical to ``apply_bpe``.

Determinism: pair/symbol frequencies are exact integer sums; the score
is one IEEE-754 division of those integers, bit-identical in any
engine, and the per-round winner is the total order (score DESC, lhs,
rhs). Longest-match is deterministic because two distinct pieces of
equal length cannot both prefix the same suffix. The DuckDB oracle
replays training rounds as unrolled CTE blocks and the apply as
``max_chars`` unrolled state-rewrite rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.bpe import _apply_merge, _pair_counts
from temporalscope_spark.operators.corpus_stats import _norm_words
from temporalscope_spark.operators.dedup import _parallelize_before_explode

UNK = "[UNK]"
_CONT = "##"


def wp_word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc, syms): corpus word frequencies with WordPiece initial
    symbols — first character bare, every later character prefixed with
    the ``##`` continuation marker."""
    words = _parallelize_before_explode(
        df.select(_norm_words(text_col).alias("_w"))
    ).select(F.explode("_w").alias("word")).filter(F.col("word") != "")
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("wc")).select(
        "word",
        "wc",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.when(
                i == 1, F.col("word").substr(i, F.lit(1))
            ).otherwise(F.concat(F.lit(_CONT), F.col("word").substr(i, F.lit(1)))),
        ).alias("syms"),
    )


def _symbol_freqs(vocab: DataFrame) -> DataFrame:
    """(sym, sf): corpus frequency of every current symbol, weighted by
    word count — the denominators of the WordPiece score."""
    return (
        vocab.select("wc", F.explode("syms").alias("sym"))
        .groupBy("sym")
        .agg(F.sum("wc").alias("sf"))
    )


def _pair_scores(vocab: DataFrame) -> DataFrame:
    """(lhs, rhs, freq, score): adjacent-pair frequencies with the
    likelihood score freq/(sf_lhs*sf_rhs). The symbol-frequency side is
    vocabulary-sized, so both joins broadcast."""
    sf = _symbol_freqs(vocab)
    return (
        _pair_counts(vocab)
        .join(F.broadcast(sf.withColumnsRenamed({"sym": "lhs", "sf": "_fl"})), "lhs")
        .join(F.broadcast(sf.withColumnsRenamed({"sym": "rhs", "sf": "_fr"})), "rhs")
        .select(
            "lhs",
            "rhs",
            "freq",
            (
                F.col("freq").cast("double")
                / (F.col("_fl").cast("double") * F.col("_fr").cast("double"))
            ).alias("score"),
        )
    )


def _learn_wp_rounds(
    vocab: DataFrame, num_merges: int
) -> tuple[list[tuple[int, str, str, int, float]], DataFrame]:
    """The WordPiece merge-round driver loop (the ``bpe._learn_rounds``
    precedent): score table → 1-row argmax collect (total order: score
    DESC, lhs, rhs) → islands+parity merge rewrite with the ``##``
    strip rule → localCheckpoint. Stops early on exhaustion."""
    merges: list[tuple[int, str, str, int, float]] = []
    handles = []
    for r in range(num_merges):
        best = (
            _pair_scores(vocab)
            .orderBy(F.col("score").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b = best[0]["lhs"], best[0]["rhs"]
        merges.append((r + 1, a, b, int(best[0]["freq"]), float(best[0]["score"])))
        # lazy persist per round (see bpe._learn_rounds): one fold per
        # round, no checkpoint job; all handles released on exit
        vocab = _apply_merge(vocab, a, b, strip_prefix="^" + _CONT).persist()
        handles.append(vocab)
    for h in handles:
        h.unpersist()
    return merges, vocab


def learn_wordpiece(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Learn the first ``num_merges`` WordPiece merges from the corpus.

    Output: (rank, lhs, rhs, freq, score) — score rounded to 6 for
    display; the argmax itself uses the unrounded IEEE division, which
    is exact in any engine given the same integer inputs.
    """
    if num_merges <= 0:
        raise DataFrameValidationError("num_merges must be > 0")
    spark = df.sparkSession
    if vocab is None:
        vocab = wp_word_vocab(df, text_col).localCheckpoint()
    merges, _ = _learn_wp_rounds(vocab, num_merges)
    return spark.createDataFrame(
        [(r, a, b, f, round(s, 6)) for r, a, b, f, s in merges],
        "rank int, lhs string, rhs string, freq long, score double",
    )


def wordpiece_pieces(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    merges: DataFrame | list | None = None,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """The final WordPiece vocabulary: the initial symbol alphabet of
    the corpus plus one piece per learned merge (``lhs`` with the
    right side's ``##`` stripped before concatenation).

    Passing a pre-learned merge table (the output of
    :func:`learn_wordpiece`, or a (lhs, rhs) list) skips the training
    rounds — a train+tokenize pipeline runs them ONCE (the
    ``bpe_compression_stats`` round-sharing contract).

    Output: (piece) — bounded (alphabet + num_merges rows). ``vocab``:
    share one checkpointed wp_word_vocab across a train+tokenize
    pipeline instead of re-exploding the corpus per stage."""
    if vocab is None:
        vocab = wp_word_vocab(df, text_col).localCheckpoint()
    if merges is None:
        learned, _ = _learn_wp_rounds(vocab, num_merges)
        pairs = [(a, b) for _, a, b, _, _ in learned]
    elif isinstance(merges, DataFrame):
        pairs = [(r["lhs"], r["rhs"]) for r in merges.orderBy("rank").collect()]
    else:
        pairs = [(a, b) for a, b in merges]
    spark = df.sparkSession
    alphabet = vocab.select(F.explode("syms").alias("piece")).distinct()
    merged = spark.createDataFrame(
        [(a + (b[len(_CONT):] if b.startswith(_CONT) else b),) for a, b in pairs],
        "piece string",
    )
    return alphabet.unionByName(merged).distinct()


def apply_wordpiece(
    df: DataFrame,
    pieces: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 16,
) -> DataFrame:
    """Greedy longest-match-first WordPiece tokenization of documents
    with a learned piece vocabulary.

    Word-closed like BPE apply, so the match loop runs over the bounded
    DISTINCT-WORD table only: ``max_chars`` fixed rounds, each a pure
    in-row rewrite of (toks, pos, done) — the longest piece prefixing
    ``substr(word, pos)`` is appended (``##``-marked when pos > 1) and
    the cursor advances by its length. A position no piece matches, or
    a word longer than ``max_chars``, yields ``[UNK]`` (BERT's
    ``max_input_chars_per_word`` contract). The piece inventory rides
    as a 1-row (starts, conts) array pair cross-joined in — no driver
    literal, no per-row Python. The corpus is touched exactly twice
    (positional explode + word→tokens join), identical to
    :func:`~temporalscope_spark.operators.bpe.apply_bpe`.

    Output: (id, tokens array<string>, n_tok int).
    """
    if max_chars <= 0:
        raise DataFrameValidationError("max_chars must be > 0")
    inv = pieces.agg(
        F.array_sort(
            F.collect_list(
                F.when(~F.col("piece").startswith(_CONT), F.col("piece"))
            )
        ).alias("_starts"),
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("piece").startswith(_CONT),
                    F.col("piece").substr(F.lit(len(_CONT) + 1), F.length("piece")),
                )
            )
        ).alias("_conts"),
    )

    words = (
        _parallelize_before_explode(df.select(_norm_words(text_col).alias("_w")))
        .select(F.explode("_w").alias("word"))
        .filter(F.col("word") != "")
        .distinct()
    )
    # the greedy cursor advances ≥1 char per step, so ``max_chars`` steps
    # always finish a ≤max_chars word — run them as ONE row-local fold
    # (accumulator: toks/pos/done). The step expression appears once in
    # the plan and executes iteratively, replacing the previous
    # max_chars sequential localCheckpoint rounds (max_chars jobs, each
    # re-materializing the word table) with one narrow projection.
    acc0 = F.struct(
        F.when(F.length("word") > max_chars, F.array(F.lit(UNK)))
        .otherwise(F.array().cast("array<string>"))
        .alias("toks"),
        F.lit(1).alias("pos"),
        (F.length("word") > max_chars).alias("done"),
    )

    def _step(acc, _):
        cand = F.filter(
            F.when(acc["pos"] == 1, F.col("_starts")).otherwise(F.col("_conts")),
            lambda p: F.col("word").substr(acc["pos"], F.length(p)) == p,
        )
        bl = F.array_max(F.transform(cand, lambda p: F.length(p)))
        bp = F.element_at(F.filter(cand, lambda p: F.length(p) == bl), 1)
        return F.struct(
            F.when(acc["done"], acc["toks"])
            .when(bl.isNull(), F.array(F.lit(UNK)))
            .otherwise(
                F.concat(
                    acc["toks"],
                    F.array(
                        F.when(acc["pos"] == 1, bp).otherwise(
                            F.concat(F.lit(_CONT), bp)
                        )
                    ),
                )
            )
            .alias("toks"),
            F.when(acc["done"] | bl.isNull(), acc["pos"])
            .otherwise(acc["pos"] + bl)
            .alias("pos"),
            F.when(acc["done"], acc["done"])
            .when(bl.isNull(), F.lit(True))
            .otherwise(acc["pos"] + bl > F.length("word"))
            .alias("done"),
        )

    match_fold = F.aggregate(
        F.sequence(F.lit(1), F.lit(max_chars)), acc0, _step, lambda acc: acc["toks"]
    )
    mapping = words.crossJoin(F.broadcast(inv)).select(
        "word", match_fold.alias("syms")
    )

    pos = (
        _parallelize_before_explode(
            df.select(F.col(id_col), _norm_words(text_col).alias("_w"))
        )
        .select(F.col(id_col), F.posexplode("_w").alias("_i", "word"))
        .filter(F.col("word") != "")
    )
    per = (
        pos.join(mapping, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_i", "syms"))),
                    lambda s: s["syms"],
                )
            ).alias("tokens")
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens"),
            F.size(F.coalesce("tokens", F.array().cast("array<string>")))
            .cast("int")
            .alias("n_tok"),
        )
    )
