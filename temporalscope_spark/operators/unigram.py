"""SentencePiece-style unigram-LM tokenizer (Kudo 2018, "Subword
Regularization: Improving Neural Network Translation Models with Multiple
Subword Candidates", arXiv:1804.10959), re-expressed relationally — the
EM-trained counterpart to the engine's distributed BPE
(:mod:`temporalscope_spark.operators.bpe`), completing the tokenizer
family: BPE learns merges greedily, the unigram LM fits piece
probabilities by expectation-maximization over every segmentation of
every word at once.

Like BPE, unigram training is vocabulary-level: the corpus collapses ONCE
into a bounded (word, count) table and everything else — candidate
seeding, the segmentation lattice, every EM round, Viterbi decoding —
runs over vocabulary-sized tables. That is the property that makes the
algorithm trainable at any corpus size: a 100 TB corpus contributes one
word-count aggregation, and the lattice/E-step/M-step cost depends only
on the distinct-word vocabulary and the piece inventory.

Relational shapes (no UDFs, no driver loops over words):

* **Seeding** — candidate pieces are all substrings (length ≤ L) of vocab
  words, scored ``occurrences × length`` (the standard frequent-substring
  seed); the top-K by (score DESC, piece) plus ALL single characters
  (coverage guarantee: every word is always segmentable). Seed
  probabilities are the integer-exact ``count / total``.
* **Lattice** — one bounded edge table (word, wc, len, i, j, piece) with
  ``piece = word[i:j]`` restricted to the seeded inventory. The edge
  STRUCTURE never changes across EM rounds (no pruning between rounds —
  Kudo's loss-based pruning schedule is a post-pass here); each round only
  re-annotates edge probabilities via one broadcast join.
* **E-step** — per word, forward/backward over the lattice as in-row
  array folds (``F.aggregate`` over positions; the inner sum is a nested
  higher-order function over the edges that end/start at the position).
  Expected piece counts are ``wc · α(i)·p·β(j) / α(len)`` summed per
  piece — one explode + one map-side-combinable aggregation over the
  bounded lattice.
* **M-step** — normalize by the 1-row expected-token total
  (broadcast-crossed aggregate, no driver collect).
* **Viterbi apply** — the same lattice with max instead of sum. The
  corpus is touched exactly twice (the ``apply_bpe`` contract): one
  positional word explode and one join against the finished word→tokens
  mapping, then per-doc ordered reassembly.

Cross-engine determinism contract (the DuckDB oracle replays every step):

* Piece probabilities are QUANTIZED to 12 decimals at the end of seeding
  and of every EM round. Float sums across words are order-dependent, but
  the accumulated error (≤ ~1e-13 relative on bounded tables) vanishes at
  the 1e-12 quantum, so both engines enter the next round — and the
  Viterbi decode — with bit-identical model inputs. The quantization
  error is far below EM's own convergence tolerance.
* Viterbi ties: candidates are reduced by struct-min over
  ``(ns = -score, i, piece)`` — highest score, then smallest start, then
  lexicographically smallest piece. With bit-identical probabilities the
  propagated path scores are bit-identical (same multiplication order
  along each path), so the DISCRETE token output is engine-independent.

Reference scope note: the TemporalScope reference has no tokenizer; this
module is part of the training-data mandate (tokens-axis payload), a
sibling of ``bpe.py`` (Sennrich et al. 2016) and the n-gram LMs in
``lm.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from temporalscope_spark.exceptions import DataFrameValidationError
from temporalscope_spark.operators.bpe import word_vocab
from temporalscope_spark.operators.corpus_stats import _norm_words
from temporalscope_spark.operators.dedup import _parallelize_before_explode

_PROB_QUANTUM = 12  # decimals; see module docstring determinism contract


def _substring_rows(vocab: DataFrame, max_piece_len: int) -> DataFrame:
    """(wc, i, l, piece) — one row per substring occurrence (start ``i``
    1-based, length ``l`` ≤ ``max_piece_len``) of each vocab word."""
    occs = F.flatten(
        F.transform(
            F.sequence(
                F.lit(1), F.least(F.lit(max_piece_len), F.length("word"))
            ),
            lambda l: F.transform(
                F.sequence(F.lit(1), F.length("word") - l + 1),
                lambda i: F.struct(
                    i.cast("int").alias("i"),
                    l.cast("int").alias("l"),
                    F.col("word").substr(i, l).alias("piece"),
                ),
            ),
        )
    )
    return vocab.select(
        "word", "wc", F.length("word").cast("int").alias("len"),
        F.explode(occs).alias("_s"),
    ).select(
        "word", "wc", "len",
        F.col("_s.i").alias("i"), F.col("_s.l").alias("l"),
        F.col("_s.piece").alias("piece"),
    )


def piece_seed(
    vocab: DataFrame, max_piece_len: int = 4, top_k: int = 24
) -> DataFrame:
    """Seed piece inventory: (piece, cnt, prob).

    ``cnt`` = occurrence count over the corpus (every start position,
    weighted by word count). Selection = top-``top_k`` by
    ``cnt·len(piece)`` (ties → lexicographically smaller piece) UNION all
    single characters; ``prob = cnt / Σ cnt`` over the selected set,
    quantized to 1e-12. All tables are vocabulary-bounded, so the
    ``orderBy().limit()`` is a TakeOrderedAndProject over ≤ |vocab|·L²
    rows — never corpus-sized.
    """
    if max_piece_len < 1:
        raise DataFrameValidationError("max_piece_len must be >= 1")
    if top_k < 1:
        raise DataFrameValidationError("top_k must be >= 1")
    cnt = (
        _substring_rows(vocab, max_piece_len)
        .groupBy("piece")
        .agg(F.sum("wc").alias("cnt"))
    )
    scored = cnt.withColumn("score", F.col("cnt") * F.length("piece"))
    topk = scored.orderBy(F.col("score").desc(), "piece").limit(top_k)
    chars = scored.filter(F.length("piece") == 1)
    sel = (
        topk.unionByName(chars)
        .select("piece", "cnt")
        .dropDuplicates(["piece"])
    )
    tot = sel.agg(F.sum("cnt").alias("_tot"))
    return sel.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        F.round(F.col("cnt") / F.col("_tot"), _PROB_QUANTUM).alias("prob"),
    )


def word_lattice(
    vocab: DataFrame, pieces: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """Bounded lattice edge table (word, wc, len, i, j, piece): 0-based
    half-open spans with ``piece = word[i:j]`` restricted to the piece
    inventory (broadcast semi-join annotation). Built once per training
    run — EM rounds re-join probabilities onto it."""
    subs = _substring_rows(vocab, max_piece_len).select(
        "word", "wc", "len",
        (F.col("i") - 1).cast("int").alias("i"),
        (F.col("i") - 1 + F.col("l")).cast("int").alias("j"),
        "piece",
    )
    return subs.join(F.broadcast(pieces.select("piece")), "piece").select(
        "word", "wc", "len", "i", "j", "piece"
    )


def _lattice_arrays(edges: DataFrame, pieces: DataFrame) -> DataFrame:
    """Collapse the edge table to one row per word with a (j, i)-sorted
    edge array annotated with current piece probabilities — the shape the
    in-row forward/backward/Viterbi folds run over."""
    e = edges.join(F.broadcast(pieces.select("piece", "prob")), "piece")
    return e.groupBy("word", "wc", "len").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("j"), F.col("i"),
                    F.col("prob").alias("p"), F.col("piece"),
                )
            )
        ).alias("edges")
    )


def _alphas() -> Column:
    """Forward probabilities: alphas[k] = α(k−1), α(0)=1,
    α(j) = Σ_{edges (i,j)} α(i)·p — one fold over positions, the inner
    sum a nested HOF over the edges ending at j (array order = i
    ascending, pinned by the (j, i) sort)."""
    return F.aggregate(
        F.sequence(F.lit(1), F.col("len")),
        F.array(F.lit(1.0)),
        lambda acc, j: F.concat(
            acc,
            F.array(
                F.aggregate(
                    F.filter(F.col("edges"), lambda e: e["j"] == j),
                    F.lit(0.0),
                    lambda s, e: s + F.element_at(acc, e["i"] + 1) * e["p"],
                )
            ),
        ),
    )


def _betas() -> Column:
    """Backward probabilities, prepend-folded over descending start
    positions: betas[k] = β(k−1), β(len)=1,
    β(i) = Σ_{edges (i,j)} p·β(j). While folding position ``jp`` the
    accumulator covers jp+1..len, so β(e.j) = acc[e.j − jp]."""
    return F.aggregate(
        F.sequence(F.col("len") - 1, F.lit(0), F.lit(-1)),
        F.array(F.lit(1.0)),
        lambda acc, jp: F.concat(
            F.array(
                F.aggregate(
                    F.filter(F.col("edges"), lambda e: e["i"] == jp),
                    F.lit(0.0),
                    lambda s, e: s + e["p"] * F.element_at(acc, e["j"] - jp),
                )
            ),
            acc,
        ),
    )


def unigram_em_round(edges: DataFrame, pieces: DataFrame) -> DataFrame:
    """One EM round: (piece, e_cnt, prob).

    E-step: per-word forward/backward in-row folds over the lattice
    arrays; expected count of an edge = ``wc · α(i)·p·β(j) / α(len)``.
    M-step: normalize by the 1-row expected-token total (broadcast-crossed
    aggregate). Output probabilities are quantized to 1e-12 (see module
    determinism contract)."""
    lat = (
        _lattice_arrays(edges, pieces)
        .withColumn("alphas", _alphas())
        .withColumn("betas", _betas())
    )
    z = F.element_at("alphas", F.col("len") + 1)
    contrib = F.transform(
        "edges",
        lambda e: F.struct(
            e["piece"].alias("piece"),
            (
                F.col("wc")
                * F.element_at("alphas", e["i"] + 1)
                * e["p"]
                * F.element_at("betas", e["j"] + 1)
                / z
            ).alias("c"),
        ),
    )
    em = (
        lat.select(F.explode(contrib).alias("_e"))
        .groupBy(F.col("_e.piece").alias("piece"))
        .agg(F.sum("_e.c").alias("e_cnt"))
    )
    tot = em.agg(F.sum("e_cnt").alias("_tot"))
    return em.crossJoin(F.broadcast(tot)).select(
        "piece",
        "e_cnt",
        F.round(F.col("e_cnt") / F.col("_tot"), _PROB_QUANTUM).alias("prob"),
    )


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    num_rounds: int = 2,
    max_piece_len: int = 4,
    top_k: int = 24,
) -> DataFrame:
    """Train the unigram LM: seed → fixed-count EM rounds (the oracle
    unrolls the SAME rounds — the iterative-operator convention shared
    with BPE/PageRank). Returns (piece, e_cnt, prob) after the final
    round (``num_rounds = 0`` returns the seed with ``e_cnt = cnt``).

    The corpus collapses once (``word_vocab``); seed, lattice, and every
    round run over vocabulary-bounded tables with per-round
    ``localCheckpoint`` lineage truncation."""
    if num_rounds < 0:
        raise DataFrameValidationError("num_rounds must be >= 0")
    vocab = word_vocab(df, text_col).select("word", "wc").localCheckpoint()
    seed = piece_seed(vocab, max_piece_len, top_k).localCheckpoint()
    if num_rounds == 0:
        return seed.select(
            "piece", F.col("cnt").cast("double").alias("e_cnt"), "prob"
        )
    edges = word_lattice(vocab, seed, max_piece_len).localCheckpoint()
    pieces = seed
    for _ in range(num_rounds):
        pieces = unigram_em_round(edges, pieces).localCheckpoint()
    return pieces


def viterbi_word_tokens(edges: DataFrame, pieces: DataFrame) -> DataFrame:
    """(word, toks): best unigram segmentation per vocab word.

    Two in-row folds over the lattice arrays: the DP propagates
    ``ns = −score`` (so struct-MIN over ``(ns, i, piece)`` is the
    max-score winner with the pinned tie-break), then the backpointer
    walk rebuilds the path in ≤ ``len`` prepend steps."""
    lat = _lattice_arrays(edges, pieces)
    best = F.aggregate(
        F.sequence(F.lit(1), F.col("len")),
        F.array(
            F.struct(
                F.lit(-1.0).alias("ns"),
                F.lit(-1).cast("int").alias("bi"),
                F.lit("").alias("piece"),
            )
        ),
        lambda acc, j: F.concat(
            acc,
            F.array(
                F.array_min(
                    F.transform(
                        F.filter(F.col("edges"), lambda e: e["j"] == j),
                        lambda e: F.struct(
                            (F.element_at(acc, e["i"] + 1)["ns"] * e["p"])
                            .alias("ns"),
                            e["i"].alias("bi"),
                            e["piece"].alias("piece"),
                        ),
                    )
                )
            ),
        ),
    )
    lat = lat.withColumn("best", best)
    toks = F.aggregate(
        F.sequence(F.lit(1), F.col("len")),
        F.struct(
            F.col("len").alias("pos"),
            F.array().cast("array<string>").alias("toks"),
        ),
        lambda acc, _: F.when(
            acc["pos"] > 0,
            F.struct(
                F.element_at(F.col("best"), acc["pos"] + 1)["bi"].alias(
                    "pos"
                ),
                F.concat(
                    F.array(
                        F.element_at(F.col("best"), acc["pos"] + 1)["piece"]
                    ),
                    acc["toks"],
                ).alias("toks"),
            ),
        ).otherwise(acc),
        lambda acc: acc["toks"],
    )
    return lat.select("word", toks.alias("toks"))


def apply_unigram(
    df: DataFrame,
    pieces: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_len: int = 4,
) -> DataFrame:
    """Tokenize DOCUMENTS with a trained piece table — the apply side of
    the unigram loop, mirroring :func:`~temporalscope_spark.operators.
    bpe.apply_bpe`'s corpus contract: the Viterbi decode runs over the
    bounded DISTINCT-WORD lattice; the corpus is touched exactly twice
    (positional word explode; join against the finished word→tokens
    mapping, vocabulary-sized so Catalyst broadcasts it when it fits)
    plus a per-doc ordered reassembly.

    Output: (id, tokens array<string>, n_tok int); docs whose text
    normalizes to empty get an empty array and n_tok 0."""
    vocab = word_vocab(df, text_col).select("word", "wc")
    edges = word_lattice(vocab, pieces, max_piece_len)
    mapping = viterbi_word_tokens(edges, pieces)

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
                    F.array_sort(F.collect_list(F.struct("_i", "toks"))),
                    lambda s: s["toks"],
                )
            ).alias("tokens")
        )
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("tokens", F.array().cast("array<string>")).alias(
                "tokens"
            ),
            F.size(F.coalesce("tokens", F.array().cast("array<string>")))
            .cast("int")
            .alias("n_tok"),
        )
    )
