"""Driver-contract query registry: SURVEY.md §2.6 operator checklist.

Each entry pairs a Spark implementation (DataFrame/SQL over the driver's
parquet tables at a given sf_dir) with an ANSI-SQL oracle DuckDB can run on
the same tables. Conventions that make the driver's order-insensitive
value-hash comparison deterministic across engines:

- every computed column is aliased identically on both sides;
- float outputs are ROUND(x, 4) (cross-engine float sums differ in the
  last ulp; 1e-4 rounding absorbs it — both engines compute in float64);
- rankings order by the ROUNDED score with an explicit id tie-break, so
  ulp-level differences cannot reorder rows;
- ints are cast to BIGINT on both sides (Spark row_number is INT, DuckDB's
  is BIGINT);
- no timestamp-typed output columns (epoch seconds instead).

The ``engine_bm25_topk`` entry runs the REAL engine (build_index +
batch_query on a temp dir) against a pure-SQL BM25 oracle — the driver-side
version of tests/test_end_to_end.py's parity gate.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable, Dict, Tuple

# ---------------------------------------------------------------------------
# fixed query set for the BM25 contract queries (terms from the documents
# vocabulary; q4 includes an absent term, q5 is single hot term)
_BM25_QUERIES = [
    (0, ["spark", "merge"]),
    (1, ["window", "agg", "sort"]),
    (2, ["customer", "query"]),
    (3, ["vector", "stream"]),
    (4, ["zzqqabsentterm"]),
    (5, ["table"]),
    (6, ["hash", "join", "fast"]),
    (7, ["slow", "filter", "scan", "batch"]),
]
_K = 10

_TOK_SPARK = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"
_TOK_DUCK = "regexp_extract_all(lower(text), '[a-z0-9]+')"

# fixed phrase set for the positional/phrase entries (bigram, trigram,
# single term, bigram, absent-term). ONE list feeds the pure-SQL entry,
# the engine entry, and its oracle — they widen in lockstep.
_PHRASES = [
    (0, "table hash"),
    (1, "part filter scan"),
    (2, "spark"),
    (3, "customer join"),
    (4, "zzqqabsentterm table"),
]

# prefix (wildcard) query set: '*'-suffixed tokens expand to every
# vocabulary term with that prefix and score as ordinary BM25 terms
# (Lucene PrefixQuery rewrite). Mixes pure prefixes, prefix+literal,
# a one-letter prefix (wide expansion), and an absent prefix.
_PREFIX_QUERIES = [
    (0, ["sca*", "merge"]),
    (1, ["ta*"]),
    (2, ["s*"]),
    (3, ["custom*", "jo*"]),
    (4, ["zzqqabsent*"]),
]

# fuzzy query set: (query_id, [(base, max_edit_distance), ...]) — each
# pattern expands to every vocabulary term within Levenshtein distance
# N and scores as an ordinary BM25 term. Misspellings of fixture vocab
# (custmer -> customer d1, tble -> table d1, wndow -> window d2 set),
# one absent base, one exact term mixed in via distance 1.
_FUZZY_QUERIES = [
    (0, [("custmer", 1)]),
    (1, [("tble", 1), ("merge", 1)]),
    (2, [("wndow", 2)]),
    (3, [("zzqqabsent", 1)]),
]

# ordered-proximity entries run the SAME phrase set at slop 1 (each
# consecutive pair may sit up to 1 extra position apart), so the exact
# and proximity result sets diverge wherever the fixture has a one-gap
# term pair — a live check that slop actually relaxes adjacency
_PHRASE_SLOP = 1


def _phrase_sql(dialect: str) -> str:
    """Join-based phrase matching over `documents` for either engine:
    positions from the simple tokenizer (posexplode / generate_series —
    position BASE differs, 0 vs 1, but only relative offsets join), one
    self-join per extra phrase term, occurrences = matching start
    positions, top-10 per query by (n_occ desc, doc_id asc). Pure ANSI
    joins — no array functions — so both dialects run the identical
    formulation. The generated-oracle pattern of language_id/lsh."""
    if dialect == "spark":
        tok = (
            "SELECT doc_id, pos, term FROM documents LATERAL VIEW "
            f"posexplode({_TOK_SPARK}) t AS pos, term"
        )
    else:
        tok = (
            "SELECT doc_id, i AS pos, lst[i] AS term FROM "
            f"(SELECT doc_id, {_TOK_DUCK} AS lst FROM documents), "
            "LATERAL unnest(generate_series(1, len(lst))) AS u(i)"
        )
    blocks = []
    for qid, phrase in _PHRASES:
        terms = phrase.split()
        if len(terms) == 1:
            blocks.append(
                f"SELECT {qid} AS query_id, doc_id, count(*) AS n_occ "
                f"FROM tok WHERE term = '{terms[0]}' GROUP BY doc_id"
            )
        else:
            joins = " ".join(
                f"JOIN tok t{i} ON t{i}.doc_id = t0.doc_id "
                f"AND t{i}.pos = t0.pos + {i}"
                for i in range(1, len(terms))
            )
            conds = " AND ".join(
                f"t{i}.term = '{t}'" for i, t in enumerate(terms))
            blocks.append(
                f"SELECT {qid} AS query_id, t0.doc_id, count(*) AS n_occ "
                f"FROM tok t0 {joins} WHERE {conds} GROUP BY t0.doc_id"
            )
    union = " UNION ALL ".join(f"({b})" for b in blocks)
    return f"""WITH tok AS ({tok}), m AS ({union}),
      ranked AS (SELECT query_id, doc_id, n_occ,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY n_occ DESC, doc_id ASC) AS rank
                 FROM m)
      SELECT CAST(query_id AS BIGINT) AS query_id,
             CAST(rank AS BIGINT) AS rank,
             CAST(doc_id AS BIGINT) AS doc_id,
             CAST(n_occ AS BIGINT) AS n_occ
      FROM ranked WHERE rank <= 10"""


def _phrase_slop_sql(dialect: str, slop: int = _PHRASE_SLOP) -> str:
    """Ordered-proximity twin of _phrase_sql: consecutive phrase terms
    must appear in order with gap in [1, 1+slop] (slop=0 degenerates to
    the exact formulation). The chain join enumerates every valid chain;
    n_occ = count(DISTINCT first-term position) matches the engine's
    "start positions that begin at least one chain" definition, so
    multi-chain starts aren't double-counted. Same pure-ANSI shape as
    _phrase_sql — identical SQL runs on both engines."""
    if dialect == "spark":
        tok = (
            "SELECT doc_id, pos, term FROM documents LATERAL VIEW "
            f"posexplode({_TOK_SPARK}) t AS pos, term"
        )
    else:
        tok = (
            "SELECT doc_id, i AS pos, lst[i] AS term FROM "
            f"(SELECT doc_id, {_TOK_DUCK} AS lst FROM documents), "
            "LATERAL unnest(generate_series(1, len(lst))) AS u(i)"
        )
    blocks = []
    for qid, phrase in _PHRASES:
        terms = phrase.split()
        if len(terms) == 1:
            blocks.append(
                f"SELECT {qid} AS query_id, doc_id, count(*) AS n_occ "
                f"FROM tok WHERE term = '{terms[0]}' GROUP BY doc_id"
            )
        else:
            joins = " ".join(
                f"JOIN tok t{i} ON t{i}.doc_id = t{i-1}.doc_id "
                f"AND t{i}.pos > t{i-1}.pos "
                f"AND t{i}.pos <= t{i-1}.pos + {1 + slop}"
                for i in range(1, len(terms))
            )
            conds = " AND ".join(
                f"t{i}.term = '{t}'" for i, t in enumerate(terms))
            blocks.append(
                f"SELECT {qid} AS query_id, t0.doc_id, "
                f"count(DISTINCT t0.pos) AS n_occ "
                f"FROM tok t0 {joins} WHERE {conds} GROUP BY t0.doc_id"
            )
    union = " UNION ALL ".join(f"({b})" for b in blocks)
    return f"""WITH tok AS ({tok}), m AS ({union}),
      ranked AS (SELECT query_id, doc_id, n_occ,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY n_occ DESC, doc_id ASC) AS rank
                 FROM m)
      SELECT CAST(query_id AS BIGINT) AS query_id,
             CAST(rank AS BIGINT) AS rank,
             CAST(doc_id AS BIGINT) AS doc_id,
             CAST(n_occ AS BIGINT) AS n_occ
      FROM ranked WHERE rank <= 10"""


def _values_clause() -> str:
    rows = ",".join(
        f"({qid}, '{t}')" for qid, terms in _BM25_QUERIES for t in sorted(set(terms))
    )
    return rows


def _tfidf_sql(dialect: str, with_doc_id: bool = False) -> str:
    """TF-IDF inner-product (the IP-metric scorer variant) over
    `documents`, top-10 per query: score = sum(idf^2 * tf)."""
    tok = _TOK_SPARK if dialect == "spark" else _TOK_DUCK
    explode = (
        f"SELECT doc_id, explode({tok}) AS term FROM documents"
        if dialect == "spark"
        else f"SELECT doc_id, unnest({tok}) AS term FROM documents"
    )
    vals = _values_clause()
    qcte = (
        f"SELECT * FROM VALUES {vals} AS t(query_id, term)"
        if dialect == "spark"
        else f"SELECT * FROM (VALUES {vals}) AS t(query_id, term)"
    )
    # n_docs counts ALL documents (matching the engine manifest's corpus-
    # level n_docs), not just tokenized ones — a zero-token doc must still
    # raise every idf (ADVICE r2)
    return f"""
WITH toks AS ({explode}),
stats AS (SELECT count(*) AS n_docs FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q AS ({qcte}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum(ln(1 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * ln(1 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5)) * tf.tf) AS raw
  FROM q
  JOIN dfreq ON dfreq.term = q.term
  JOIN tf ON tf.term = q.term
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, round(raw, 4) AS score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY round(raw, 4) DESC, doc_id) AS BIGINT) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id,
       {"rank, CAST(doc_id AS BIGINT) AS doc_id, score" if with_doc_id else "rank, score"}
FROM ranked WHERE rank <= {_K}
"""


def _bm25_sql(dialect: str, with_doc_id: bool) -> str:
    """Full BM25 (k1=1.2, b=0.75, Lucene idf) over `documents`, top-10 per
    query, ranked by rounded score with doc_id tie-break."""
    tok = _TOK_SPARK if dialect == "spark" else _TOK_DUCK
    explode = (
        f"SELECT doc_id, explode({tok}) AS term FROM documents"
        if dialect == "spark"
        else f"SELECT doc_id, unnest({tok}) AS term FROM documents"
    )
    vals = _values_clause()
    qcte = (
        f"SELECT * FROM VALUES {vals} AS t(query_id, term)"
        if dialect == "spark"
        else f"SELECT * FROM (VALUES {vals}) AS t(query_id, term)"
    )
    cols = "rank, doc_id, score" if with_doc_id else "rank, score"
    size_fn = "size" if dialect == "spark" else "len"
    # dl/stats over ALL documents (zero-token docs keep dl=0 and still count
    # toward n_docs/avgdl — the engine manifest's corpus-level semantics)
    return f"""
WITH toks AS ({explode}),
dl AS (SELECT doc_id, {size_fn}({tok}) AS dl FROM documents),
stats AS (SELECT count(*) AS n_docs, sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q AS ({qcte}),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum(ln(1 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * (tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))) AS raw
  FROM q
  JOIN dfreq ON dfreq.term = q.term
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, round(raw, 4) AS score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY round(raw, 4) DESC, doc_id) AS BIGINT) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, {cols}
FROM ranked WHERE rank <= {_K}
"""


def _bm25_fuzzy_sql(dialect: str) -> str:
    """BM25 over _FUZZY_QUERIES with the edit-distance expansion done
    INSIDE the SQL: the pattern table joins levenshtein(term, base) <= N
    against the vocabulary — the same standard (non-Damerau) distance
    both engines implement under the same function name, so one
    formulation serves both. DISTINCT guards overlapping patterns."""
    tok = _TOK_SPARK if dialect == "spark" else _TOK_DUCK
    explode = (
        f"SELECT doc_id, explode({tok}) AS term FROM documents"
        if dialect == "spark"
        else f"SELECT doc_id, unnest({tok}) AS term FROM documents"
    )
    pats = ",".join(
        f"({qid}, '{base}', {d})"
        for qid, specs in _FUZZY_QUERIES for base, d in sorted(set(specs))
    )
    pat_cte = (
        f"SELECT * FROM VALUES {pats} AS t(query_id, base, maxd)"
        if dialect == "spark"
        else f"SELECT * FROM (VALUES {pats}) AS t(query_id, base, maxd)"
    )
    size_fn = "size" if dialect == "spark" else "len"
    return f"""
WITH toks AS ({explode}),
dl AS (SELECT doc_id, {size_fn}({tok}) AS dl FROM documents),
stats AS (SELECT count(*) AS n_docs, sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q AS (SELECT DISTINCT p.query_id, d.term
      FROM ({pat_cte}) p JOIN dfreq d ON levenshtein(d.term, p.base) <= p.maxd),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum(ln(1 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * (tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))) AS raw
  FROM q
  JOIN dfreq ON dfreq.term = q.term
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, round(raw, 4) AS score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY round(raw, 4) DESC, doc_id) AS BIGINT) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id, score
FROM ranked WHERE rank <= {_K}
"""


def _bm25_prefix_sql(dialect: str) -> str:
    """BM25 over _PREFIX_QUERIES with the pattern expansion done INSIDE
    the SQL: the query table joins LIKE patterns ('sca%' for 'sca*',
    bare literals otherwise — all-alnum terms, so no LIKE metacharacter
    escaping is needed) against the vocabulary (dfreq), DISTINCT so
    overlapping patterns within one query never double-count a term.
    Everything downstream is the _bm25_sql formulation verbatim."""
    tok = _TOK_SPARK if dialect == "spark" else _TOK_DUCK
    explode = (
        f"SELECT doc_id, explode({tok}) AS term FROM documents"
        if dialect == "spark"
        else f"SELECT doc_id, unnest({tok}) AS term FROM documents"
    )
    pats = ",".join(
        f"({qid}, '{t[:-1]}%')" if t.endswith("*") else f"({qid}, '{t}')"
        for qid, tokens in _PREFIX_QUERIES for t in sorted(set(tokens))
    )
    pat_cte = (
        f"SELECT * FROM VALUES {pats} AS t(query_id, pat)"
        if dialect == "spark"
        else f"SELECT * FROM (VALUES {pats}) AS t(query_id, pat)"
    )
    size_fn = "size" if dialect == "spark" else "len"
    return f"""
WITH toks AS ({explode}),
dl AS (SELECT doc_id, {size_fn}({tok}) AS dl FROM documents),
stats AS (SELECT count(*) AS n_docs, sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
q AS (SELECT DISTINCT p.query_id, d.term
      FROM ({pat_cte}) p JOIN dfreq d ON d.term LIKE p.pat),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum(ln(1 + (s.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
             * (tf.tf * 2.2 / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))) AS raw
  FROM q
  JOIN dfreq ON dfreq.term = q.term
  JOIN tf ON tf.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, round(raw, 4) AS score,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY round(raw, 4) DESC, doc_id) AS BIGINT) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, rank, doc_id, score
FROM ranked WHERE rank <= {_K}
"""


# ---------------------------------------------------------------------------
# registry: name -> (spark_sql or callable, duck_sql or None, tables)

def _registry() -> Dict[str, Tuple[object, str, tuple]]:
    r: Dict[str, Tuple[object, str, tuple]] = {}

    # S1/scan ✦ — corpus scan + sha256 invariant
    r["corpus_scan_sha"] = (
        """SELECT CAST(doc_id AS BIGINT) AS doc_id, sha2(text, 256) AS content_sha,
                  CAST(length(text) AS BIGINT) AS n FROM documents""",
        """SELECT CAST(doc_id AS BIGINT) AS doc_id, sha256(text) AS content_sha,
                  CAST(length(text) AS BIGINT) AS n FROM documents""",
        ("documents",),
    )

    # projection / filter with pushdown ✦
    r["filter_project"] = (
        """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
           FROM documents WHERE lang = 'en' AND n_chars > 300""",
        """SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
           FROM documents WHERE lang = 'en' AND n_chars > 300""",
        ("documents",),
    )

    # string funcs / tokenizer ✦ — token counting (text-analysis op)
    r["tokenize_count"] = (
        f"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(size({_TOK_SPARK}) AS BIGINT) AS n_tokens FROM documents""",
        f"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(len({_TOK_DUCK}) AS BIGINT) AS n_tokens FROM documents""",
        ("documents",),
    )

    # text analysis — token counting, whitespace + BPE-ish regex (the
    # GPT-2-style pre-tokenizer classes: letter runs, single digits,
    # punctuation runs; both engines run the same RE2/Java-safe pattern).
    # NB Spark SQL string literals process backslash escapes ('\s' -> 's'),
    # so the Spark side double-escapes to hand the regex engine \S / \s;
    # counting \S+ runs instead of splitting also makes the empty/
    # whitespace-only edge identical across engines with no CASE.
    r["token_counts_bpe"] = (
        """SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  CAST(size(regexp_extract_all(text, '\\\\S+', 0)) AS BIGINT) AS ws_tokens,
                  CAST(size(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\\\s]+', 0)) AS BIGINT) AS bpe_tokens
           FROM documents""",
        """SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS ws_tokens,
                  CAST(len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+')) AS BIGINT) AS bpe_tokens
           FROM documents""",
        ("documents",),
    )

    # positional phrase matching, pure SQL on both engines (the SQL-level
    # twin of the engine path below; one _PHRASES list feeds all three)
    r["phrase_match_sql"] = (
        _phrase_sql("spark"),
        _phrase_sql("duck"),
        ("documents",),
    )

    # ordered-proximity (slop) matching, pure SQL on both engines
    r["phrase_slop_sql"] = (
        _phrase_slop_sql("spark"),
        _phrase_slop_sql("duck"),
        ("documents",),
    )

    # prefix-expanded BM25, pure SQL on both engines (LIKE-join rewrite)
    r["bm25_prefix_sql"] = (
        _bm25_prefix_sql("spark"),
        _bm25_prefix_sql("duck"),
        ("documents",),
    )

    # fuzzy-expanded BM25, pure SQL on both engines (levenshtein join)
    r["bm25_fuzzy_sql"] = (
        _bm25_fuzzy_sql("spark"),
        _bm25_fuzzy_sql("duck"),
        ("documents",),
    )

    # hash aggregation ✦ — per-term document frequency (the df stat)
    r["term_df"] = (
        f"""SELECT term, CAST(count(*) AS BIGINT) AS df FROM (
              SELECT DISTINCT doc_id, explode({_TOK_SPARK}) AS term FROM documents
            ) GROUP BY term""",
        f"""SELECT term, CAST(count(*) AS BIGINT) AS df FROM (
              SELECT DISTINCT doc_id, unnest({_TOK_DUCK}) AS term FROM documents
            ) GROUP BY term""",
        ("documents",),
    )

    # distinct / approx ✦ — vocabulary size + token totals
    r["vocab_stats"] = (
        f"""SELECT CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
                   CAST(count(*) AS BIGINT) AS n_tokens
            FROM (SELECT explode({_TOK_SPARK}) AS term FROM documents)""",
        f"""SELECT CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
                   CAST(count(*) AS BIGINT) AS n_tokens
            FROM (SELECT unnest({_TOK_DUCK}) AS term FROM documents)""",
        ("documents",),
    )

    # broadcast join ✦ — per-doc dl vs broadcast corpus stats (B4 analog).
    # Arithmetic discipline (round-1 fix): `sum(dl) * 1.0` makes 1.0 a
    # DECIMAL(2,1) literal in Spark and the whole expression Decimal, while
    # DuckDB computes double — every row hash-mismatched. Both sides now
    # CAST to DOUBLE explicitly (exact integer inputs -> one IEEE division
    # each, bit-identical), and the output is an INTEGER (floor of the
    # ratio in basis points) so no float representation reaches the hash.
    r["broadcast_stats_join"] = (
        f"""WITH dl AS (SELECT doc_id, size({_TOK_SPARK}) AS dl FROM documents),
                 s AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl)
            SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(dl AS BIGINT) AS dl,
                   CAST(floor(CAST(dl AS DOUBLE) * 10000.0 / s.avgdl) AS BIGINT) AS dl_ratio_bp
            FROM dl CROSS JOIN s""",
        f"""WITH dl AS (SELECT doc_id, len({_TOK_DUCK}) AS dl FROM documents),
                 s AS (SELECT CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl)
            SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(dl AS BIGINT) AS dl,
                   CAST(floor(CAST(dl AS DOUBLE) * 10000.0 / s.avgdl) AS BIGINT) AS dl_ratio_bp
            FROM dl CROSS JOIN s""",
        ("documents",),
    )

    # flagship: SQL-expressed BM25 top-k (hash join + agg + window) ✦
    r["bm25_topk_sql"] = (
        _bm25_sql("spark", with_doc_id=True),
        _bm25_sql("duck", with_doc_id=True),
        ("documents",),
    )

    # window ranking ✦
    r["window_rank_docs"] = (
        """SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, CAST(rn AS BIGINT) AS rn FROM (
             SELECT lang, doc_id,
                    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
             FROM documents) WHERE rn <= 3""",
        """SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, CAST(rn AS BIGINT) AS rn FROM (
             SELECT lang, doc_id,
                    row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
             FROM documents) t WHERE rn <= 3""",
        ("documents",),
    )

    # rollup ✦
    r["rollup_lang_source"] = (
        """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
                  CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY ROLLUP (lang, source)""",
        """SELECT coalesce(lang, 'ALL') AS lang, coalesce(source, 'ALL') AS source,
                  CAST(count(*) AS BIGINT) AS n_docs
           FROM documents GROUP BY ROLLUP (lang, source)""",
        ("documents",),
    )

    # union ✦
    r["union_distinct"] = (
        """SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id FROM (
             SELECT doc_id FROM documents WHERE n_chars > 400
             UNION ALL
             SELECT doc_id FROM documents WHERE source = 'src1')""",
        """SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id FROM (
             SELECT doc_id FROM documents WHERE n_chars > 400
             UNION ALL
             SELECT doc_id FROM documents WHERE source = 'src1') t""",
        ("documents",),
    )

    # multi-term AND (posting intersection) ✦
    r["multi_term_and"] = (
        f"""SELECT CAST(doc_id AS BIGINT) AS doc_id FROM (
              SELECT doc_id, {_TOK_SPARK} AS toks FROM documents)
            WHERE array_contains(toks, 'spark') AND array_contains(toks, 'merge')""",
        f"""SELECT CAST(doc_id AS BIGINT) AS doc_id FROM (
              SELECT doc_id, {_TOK_DUCK} AS toks FROM documents) t
            WHERE list_contains(toks, 'spark') AND list_contains(toks, 'merge')""",
        ("documents",),
    )

    # anti join ✦ — incremental re-index: docs not yet indexed
    r["anti_join_new_docs"] = (
        """SELECT CAST(d.doc_id AS BIGINT) AS doc_id FROM documents d
           LEFT ANTI JOIN (SELECT doc_id FROM documents WHERE doc_id % 3 = 0) i
           ON d.doc_id = i.doc_id""",
        """SELECT CAST(d.doc_id AS BIGINT) AS doc_id FROM documents d
           WHERE NOT EXISTS (SELECT 1 FROM documents i
                             WHERE i.doc_id % 3 = 0 AND i.doc_id = d.doc_id)""",
        ("documents",),
    )

    # classic relational agg over lineitem (partial+final agg, math) ✦
    r["lineitem_pricing_summary"] = (
        """SELECT l_returnflag, l_linestatus,
                  round(sum(l_quantity), 2) AS sum_qty,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                  CAST(count(*) AS BIGINT) AS n_rows
           FROM lineitem WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
           GROUP BY l_returnflag, l_linestatus""",
        """SELECT l_returnflag, l_linestatus,
                  round(sum(l_quantity), 2) AS sum_qty,
                  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                  CAST(count(*) AS BIGINT) AS n_rows
           FROM lineitem WHERE l_shipdate <= timestamp '1998-09-02 00:00:00'
           GROUP BY l_returnflag, l_linestatus""",
        ("lineitem",),
    )

    # join + agg (orders ⋈ customer) ✦
    r["orders_by_segment"] = (
        """SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_orders,
                  round(sum(o.o_totalprice), 2) AS total
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           GROUP BY c.c_mktsegment""",
        """SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n_orders,
                  round(sum(o.o_totalprice), 2) AS total
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           GROUP BY c.c_mktsegment""",
        ("orders", "customer"),
    )

    # exact percentiles (latency-stat analog, metrics.py:80-114) ✦
    r["event_value_percentiles"] = (
        """SELECT event_type,
                  round(percentile(value, 0.5), 4) AS p50,
                  round(percentile(value, 0.95), 4) AS p95,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY event_type""",
        """SELECT event_type,
                  round(quantile_cont(value, 0.5), 4) AS p50,
                  round(quantile_cont(value, 0.95), 4) AS p95,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY event_type""",
        ("events",),
    )

    # time bucketing (streaming-window analog, epoch seconds out) ✦
    r["events_hourly"] = (
        """SELECT CAST(unix_timestamp(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                  event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
           FROM events GROUP BY date_trunc('hour', ts), event_type""",
        """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_epoch,
                  event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS sum_value
           FROM events GROUP BY date_trunc('hour', ts), event_type""",
        ("events",),
    )

    # exact dedup by content hash (training-pipeline op, engine fn) ✦
    def _dedup_exact(spark, sf_dir):
        from flatnav_spark.textops import exact_dedup

        _ensure_views(spark, sf_dir, ("documents",))
        return exact_dedup(spark.table("documents"))

    r["dedup_exact"] = (
        _dedup_exact,
        """SELECT content_sha, CAST(count(*) AS BIGINT) AS n_dups,
                  CAST(min(doc_id) AS BIGINT) AS keeper
           FROM (SELECT doc_id, sha256(text) AS content_sha FROM documents) t
           GROUP BY content_sha HAVING count(*) > 1""",
        ("documents",),
    )

    # n-gram (token-set) Jaccard near-dup pairs (training-pipeline op,
    # engine fn) ✦
    def _near_dup(spark, sf_dir):
        from flatnav_spark.textops import jaccard_pairs

        _ensure_views(spark, sf_dir, ("documents",))
        return jaccard_pairs(spark.table("documents").filter("doc_id < 30"), threshold=0.8)

    r["near_dup_jaccard"] = (
        _near_dup,
        f"""WITH toks AS (SELECT DISTINCT doc_id, unnest({_TOK_DUCK}) AS term
                          FROM documents WHERE doc_id < 30),
                 card AS (SELECT doc_id, count(*) AS c FROM toks GROUP BY doc_id),
                 inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
                           FROM toks a JOIN toks b ON a.term = b.term AND a.doc_id < b.doc_id
                           GROUP BY a.doc_id, b.doc_id)
            SELECT CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
                   round(i * 1.0 / (ca.c + cb.c - i), 4) AS jaccard
            FROM inter JOIN card ca ON ca.doc_id = d1 JOIN card cb ON cb.doc_id = d2
            WHERE i * 1.0 / (ca.c + cb.c - i) >= 0.8""",
        ("documents",),
    )

    # MinHash signatures + LSH band bucket (training-pipeline op,
    # engine fn) ✦
    minhash_cols_duck = ",\n".join(
        f"min(md5(concat('s{i}:', term))) AS mh{i}" for i in range(8)
    )

    def _minhash(spark, sf_dir):
        from flatnav_spark.textops import minhash_signatures

        _ensure_views(spark, sf_dir, ("documents",))
        return minhash_signatures(spark.table("documents"))

    r["minhash_lsh"] = (
        _minhash,
        f"""WITH toks AS (SELECT DISTINCT doc_id, unnest({_TOK_DUCK}) AS term FROM documents)
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {minhash_cols_duck},
                   substring(min(md5(concat('s0:', term))), 1, 8) AS band0
            FROM toks GROUP BY doc_id""",
        ("documents",),
    )

    # LSH candidate pairs from banded MinHash (engine fn) ✦
    duck_bands = "\nUNION ALL\n".join(
        f"""SELECT doc_id, concat('b{i}:', substring(mh{i}, 1, 4)) AS band FROM sigs"""
        for i in range(8)
    )

    def _lsh_pairs(spark, sf_dir):
        from flatnav_spark.textops import lsh_candidate_pairs

        _ensure_views(spark, sf_dir, ("documents",))
        return lsh_candidate_pairs(spark.table("documents").filter("doc_id < 30"))

    r["lsh_candidate_pairs"] = (
        _lsh_pairs,
        f"""WITH toks AS (SELECT DISTINCT doc_id, unnest({_TOK_DUCK}) AS term
                          FROM documents WHERE doc_id < 30),
                 sigs AS (SELECT doc_id, {minhash_cols_duck} FROM toks GROUP BY doc_id),
                 bands AS ({duck_bands})
            SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS d1, CAST(b.doc_id AS BIGINT) AS d2
            FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id""",
        ("documents",),
    )

    # Production-grade banded MinHash at 64 hashes with the derived (b, r)
    # banding policy (round-3 VERDICT #7) — the 8-hash entries above stay
    # as the candidate-generation-grade oracle ✦
    from flatnav_spark.textops import minhash_band_params

    n64 = 64
    b64, r64 = minhash_band_params(n64, 0.8)  # -> (8, 8) at target j=0.8
    minhash64_cols_duck = ",\n".join(
        f"min(md5(concat('s{i}:', term))) AS mh{i}" for i in range(n64)
    )
    duck_bands64 = "\nUNION ALL\n".join(
        "SELECT doc_id, md5(concat_ws('|', 'B{j}', {cols})) AS band FROM sigs".format(
            j=j, cols=", ".join(f"mh{j * r64 + i}" for i in range(r64))
        )
        for j in range(b64)
    )

    def _minhash64_pairs(spark, sf_dir):
        from flatnav_spark.textops import minhash_lsh_pairs

        _ensure_views(spark, sf_dir, ("documents",))
        return minhash_lsh_pairs(
            spark.table("documents").filter("doc_id < 30"), n_hashes=n64,
            target_jaccard=0.8)

    r["minhash_lsh_pairs64"] = (
        _minhash64_pairs,
        f"""WITH toks AS (SELECT DISTINCT doc_id, unnest({_TOK_DUCK}) AS term
                          FROM documents WHERE doc_id < 30),
                 sigs AS (SELECT doc_id, {minhash64_cols_duck} FROM toks GROUP BY doc_id),
                 bands AS ({duck_bands64})
            SELECT DISTINCT CAST(a.doc_id AS BIGINT) AS d1, CAST(b.doc_id AS BIGINT) AS d2
            FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id""",
        ("documents",),
    )

    # SimHash fingerprints (training-pipeline op, engine fn) ✦
    hex_high = "'8','9','a','b','c','d','e','f'"
    from flatnav_spark.textops import SIMHASH_BITS

    duck_bit_sums = ",\n".join(
        f"sum(CASE WHEN substring(h, {i + 1}, 1) IN ({hex_high}) THEN 1 ELSE -1 END) AS s{i}"
        for i in range(SIMHASH_BITS)
    )
    duck_fp = " + ".join(
        f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(SIMHASH_BITS)
    )

    def _simhash(spark, sf_dir):
        from flatnav_spark.textops import simhash

        _ensure_views(spark, sf_dir, ("documents",))
        return simhash(spark.table("documents"))

    r["simhash_fingerprint"] = (
        _simhash,
        f"""WITH toks AS (SELECT DISTINCT doc_id, unnest({_TOK_DUCK}) AS term FROM documents),
                 h AS (SELECT doc_id, md5(term) AS h FROM toks),
                 s AS (SELECT doc_id, {duck_bit_sums} FROM h GROUP BY doc_id)
            SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST({duck_fp} AS BIGINT) AS simhash
            FROM s""",
        ("documents",),
    )

    # language-ID heuristic (training-pipeline op, engine fn) ✦
    from flatnav_spark.textops import LANG_PROFILES

    duck_scores = ",\n".join(
        "round(len(list_filter(toks, x -> x IN ({lst}))) * 1.0 / len(toks), 4) AS score_{n}".format(
            lst=", ".join(f"'{w}'" for w in words), n=name
        )
        for name, words in sorted(LANG_PROFILES.items())
    )
    names = sorted(LANG_PROFILES.keys())
    duck_best = "greatest(" + ", ".join(f"score_{n}" for n in names) + ")"
    duck_pred = "CASE " + " ".join(
        f"WHEN score_{n} = {duck_best} THEN '{n}'" for n in names
    ) + " END"

    def _lang_id(spark, sf_dir):
        from flatnav_spark.textops import language_id

        _ensure_views(spark, sf_dir, ("documents",))
        return language_id(spark.table("documents"))

    r["language_id"] = (
        _lang_id,
        f"""WITH t AS (SELECT doc_id, {_TOK_DUCK} AS toks FROM documents),
                 s AS (SELECT doc_id, {duck_scores} FROM t WHERE len(toks) > 0)
            SELECT CAST(doc_id AS BIGINT) AS doc_id, {duck_pred} AS lang_pred,
                   {duck_best} AS lang_score
            FROM s""",
        ("documents",),
    )

    # document fingerprint: md5 of the sorted distinct token set ✦
    r["doc_fingerprint"] = (
        f"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   md5(concat_ws(' ', array_sort(array_distinct({_TOK_SPARK})))) AS fp
            FROM documents""",
        f"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   md5(array_to_string(list_sort(list_distinct({_TOK_DUCK})), ' ')) AS fp
            FROM documents""",
        ("documents",),
    )

    # text quality scoring (training-pipeline op, engine fn) ✦
    def _quality(spark, sf_dir):
        from flatnav_spark.textops import quality_scores

        _ensure_views(spark, sf_dir, ("documents",))
        return quality_scores(spark.table("documents"))

    r["text_quality"] = (
        _quality,
        f"""WITH t AS (SELECT doc_id, text, {_TOK_DUCK} AS toks FROM documents)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   round(length(array_to_string(toks, '')) * 1.0 / len(toks), 4) AS avg_tok_len,
                   round(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and'))) * 1.0
                         / len(toks), 4) AS stopword_ratio
            FROM t WHERE len(toks) > 0""",
        ("documents",),
    )

    # brute-force cosine top-k over embeddings (similarity-search op,
    # engine fn) ✦
    def _cosine_topk(spark, sf_dir):
        from flatnav_spark.simsearch import cosine_topk

        _ensure_views(spark, sf_dir, ("embeddings",))
        emb = spark.table("embeddings")
        q = emb.filter("vec_id < 3").select(
            emb.vec_id.alias("qid"), emb.embedding.alias("qe")
        )
        return cosine_topk(emb, q, k=5)

    r["embedding_cosine_topk"] = (
        _cosine_topk,
        """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 3),
                dots AS (
                  SELECT q.qid, e.vec_id,
                         list_sum(list_transform(range(1, 65),
                                  i -> qe[i]::DOUBLE * e.embedding[i]::DOUBLE)) AS dot,
                         sqrt(list_sum(list_transform(qe, x -> x::DOUBLE * x::DOUBLE))) AS nq,
                         sqrt(list_sum(list_transform(e.embedding, x -> x::DOUBLE * x::DOUBLE))) AS ne
                  FROM q CROSS JOIN embeddings e),
                ranked AS (
                  SELECT qid, vec_id, round(dot / (nq * ne), 4) AS cos,
                         CAST(row_number() OVER (PARTITION BY qid
                              ORDER BY round(dot / (nq * ne), 4) DESC, vec_id) AS BIGINT) AS rank
                  FROM dots)
           SELECT CAST(qid AS BIGINT) AS qid, rank, CAST(vec_id AS BIGINT) AS vec_id, cos
           FROM ranked WHERE rank <= 5""",
        ("embeddings",),
    )

    return r


def _ensure_views(spark, sf_dir: str, tables: tuple) -> None:
    for t in tables:
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).createOrReplaceTempView(t)


def _make_sql_query(sql: str, tables: tuple) -> Callable:
    def run(spark, sf_dir: str):
        _ensure_views(spark, sf_dir, tables)
        return spark.sql(sql)

    return run


# ---------------------------------------------------------------------------
# multimodal plumbing entries — the Spark side runs the real mapInPandas
# kernels over the deterministic fixture assets; the DuckDB oracle reads a
# committed golden parquet produced by the same pure-python reference
# computation (flatnav_spark/multimodal.py golden_*), the ground-truth-file
# pattern of the reference harness (experiments/README.md:205-211).

_GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def lsh_ann_topk(spark, sf_dir: str):
    from flatnav_spark.simsearch import lsh_cosine_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter("vec_id < 3").select(
        emb.vec_id.alias("qid"), emb.embedding.alias("qe")
    )
    return lsh_cosine_topk(emb, q, k=5, n_planes=32, n_bands=8)


def ivf_ann_topk(spark, sf_dir: str):
    """IVF coarse-quantizer ANN (SURVEY C3 k-means + inverted-file probe)
    through the REAL Spark path — kmeans_fit runs two distributed Lloyd
    iterations, the probe joins only nprobe clusters per query — against a
    generated DuckDB replay of the identical rounded computation."""
    from flatnav_spark.simsearch import ivf_topk

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter("vec_id < 3").select(
        emb.vec_id.alias("qid"), emb.embedding.alias("qe")
    )
    return ivf_topk(emb, q, k=5, n_clusters=8, nprobe=3, n_iters=2)


def embedding_near_dup(spark, sf_dir: str):
    """Embedding-cosine near-dup pairs via hyperplane-LSH banding — the
    embedding-space member of the dedup family (exact sha / minhash /
    simhash / token-jaccard / THIS), hash-gated by a generated replay."""
    from flatnav_spark.simsearch import embedding_near_dup_pairs

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_near_dup_pairs(emb, threshold=0.4, n_planes=32, n_bands=8,
                                    dim=64)


def multimodal_decode(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from flatnav_spark.multimodal import decode_images, synth_assets

    return decode_images(synth_assets(spark, 50)).select(
        F.col("asset_id").cast("long").alias("asset_id"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("channels").cast("long").alias("channels"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "payload_sha",
    )


_MULTIMODAL_DECODE_ORACLE = f"""
SELECT CAST(asset_id AS BIGINT) AS asset_id, CAST(width AS BIGINT) AS width,
       CAST(height AS BIGINT) AS height, CAST(channels AS BIGINT) AS channels,
       CAST(n_bytes AS BIGINT) AS n_bytes, payload_sha
FROM read_parquet('{os.path.join(_GOLDEN_DIR, "multimodal_decode_golden.parquet")}')
"""


def multimodal_features(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from flatnav_spark.multimodal import extract_feature_rows, synth_assets

    return extract_feature_rows(synth_assets(spark, 50)).select(
        F.col("asset_id").cast("long").alias("asset_id"),
        F.col("dim").cast("long").alias("dim"),
        F.col("count").cast("long").alias("count"),
    )


_MULTIMODAL_FEATURES_ORACLE = f"""
SELECT CAST(asset_id AS BIGINT) AS asset_id, CAST(dim AS BIGINT) AS dim,
       CAST(count AS BIGINT) AS count
FROM read_parquet('{os.path.join(_GOLDEN_DIR, "multimodal_features_golden.parquet")}')
"""


# ---------------------------------------------------------------------------
# the real-engine parity entry: build a temp index over documents-as-corpus
# and batch_query it; oracle is the pure-SQL BM25 with full doc identity —
# the engine's internal doc_ids are joined back to the source doc_id, so
# the driver hash covers (query_id, rank, source doc_id, score)

_ENGINE_CACHE: dict = {}


def _engine_index_for(spark, sf_dir: str):
    """Temp engine index over `documents` for the parity entries.

    Tie-break alignment: the engine breaks score ties by INTERNAL doc_id;
    the SQL oracle by SOURCE doc_id. So the corpus is shaped to make the
    two orders coincide — constant repo + zero-padded source id in the
    path + n_splits=1 makes the stage-1 ordinal (ordered by repo, path,
    commit) enumerate docs in source-id order, i.e. internal == source id.
    Without this, a score tie straddling the k boundary selects different
    (equally correct) docs on each side and the hash compare can't see
    they tie."""
    from flatnav_spark.build import build_index

    key = os.path.abspath(sf_dir)
    if key in _ENGINE_CACHE and os.path.exists(_ENGINE_CACHE[key].path):
        return _ENGINE_CACHE[key]
    out = os.path.join(tempfile.mkdtemp(prefix="flatnav_idx_"), "index")
    idx = build_index(_engine_corpus(spark, sf_dir), out, mode="simple",
                      n_splits=1, n_groups=1, block_range=256,
                      out_partitions=4)
    _ENGINE_CACHE[key] = idx
    return idx


def _engine_corpus(spark, sf_dir: str):
    """The `documents` fixture reshaped to the input_hint corpus schema,
    with the source doc_id embedded in the path (see _engine_index_for's
    tie-break note)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.lit("corpus").alias("repo"),
        F.format_string("doc/%010d.txt", F.col("doc_id")).alias("path"),
        F.sha2(F.col("doc_id").cast("string"), 256).substr(1, 40).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def _engine_topk(spark, sf_dir: str, scorer: str, runner=None, qrows=None):
    """Engine top-k with DOC IDENTITY restored (round-2 VERDICT #5): the
    engine's internal doc_ids are joined back to the source `documents`
    doc_id (embedded in the corpus path by documents_as_corpus), then
    re-ranked by (rounded score desc, source doc_id asc) — the oracle's
    exact ordering — so the driver hash covers WHICH document was
    retrieved, not just its score, like the pytest identity gate
    (tests/test_end_to_end.py)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flatnav_spark.query import batch_query

    idx = _engine_index_for(spark, sf_dir)
    if qrows is None:
        qrows = [(qid, " ".join(terms)) for qid, terms in _BM25_QUERIES]
    qdf = spark.createDataFrame(qrows, "query_id long, query_text string")
    # k + slack: the engine ranks by RAW float64 score, the oracle by the
    # 4-decimal ROUNDED score — two distinct raw scores that round equal at
    # the k boundary would select different docs. Over-fetching then
    # re-ranking by (rounded, id) reproduces the oracle's cut exactly.
    # The slack ESCALATES until provably sufficient (round-3 ADVICE: a
    # fixed +10 fails if >10 docs share the boundary rounded score): a
    # query's cut is safe when it returned fewer than k+slack rows (all
    # its matches fetched) OR its fetch-minimum rounded score is STRICTLY
    # below its rounded k-th — any unfetched doc then rounds below the
    # boundary and cannot enter the top k.
    src = idx.docs(spark).select(
        "doc_id",
        F.regexp_extract("path", r"doc/(\d+)\.txt", 1).cast("long").alias("src_doc_id"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 4)), F.asc("src_doc_id")
    )
    if runner is None:
        def runner(qdf_, kk):
            return batch_query(spark, idx, qdf_, k=kk, prune=True, scorer=scorer)
    slack = 10
    while True:
        res = runner(qdf, _K + slack)
        joined = res.join(src, "doc_id").select("query_id", "src_doc_id", "score")
        if _K + slack >= idx.manifest.n_docs:
            # fetch covers the whole corpus: trivially complete (derived
            # from the engine index, not a constant — a grown fixture
            # can't silently weaken the boundary-tie check)
            break
        fetched = joined.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("nf"),
            F.min(F.round("score", 4)).alias("rmin"),
        )
        rk = (
            joined.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") == _K)
            .select("query_id", F.round("score", 4).alias("rk"))
        )
        unsafe = (
            fetched.join(rk, "query_id")
            .filter((F.col("nf") >= _K + slack) & (F.col("rmin") >= F.col("rk")))
            .limit(1).collect()
        )
        if not unsafe:
            break
        slack *= 4
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _K)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("src_doc_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
    )


def engine_bm25_topk(spark, sf_dir: str):
    return _engine_topk(spark, sf_dir, "bm25")


def engine_prefix_topk(spark, sf_dir: str):
    """Prefix (wildcard) queries through the REAL engine: '*'-patterns
    expand against the index vocabulary driver-side (term-sorted stats
    scan with StringStartsWith pushdown — query.py:expand_query_patterns)
    and score as ordinary BM25 terms via prefix_query_batch; gated
    against the in-SQL LIKE-expansion oracle (_bm25_prefix_sql). Same
    doc-identity + escalating-slack boundary protocol as the BM25 entry."""
    from flatnav_spark.query import prefix_query_batch

    idx = _engine_index_for(spark, sf_dir)

    def runner(qdf_, kk):
        return prefix_query_batch(spark, idx, qdf_, k=kk, prune=True,
                                  scorer="bm25")

    qrows = [(qid, " ".join(toks)) for qid, toks in _PREFIX_QUERIES]
    return _engine_topk(spark, sf_dir, "bm25", runner=runner, qrows=qrows)


def engine_fuzzy_topk(spark, sf_dir: str):
    """Fuzzy queries through the REAL engine: '~N' patterns expand to
    all vocabulary terms within Levenshtein distance N (driver-side
    banded DP or an in-scan levenshtein filter — both the standard
    distance) and score as ordinary BM25 terms; gated against the
    in-SQL levenshtein-join oracle (_bm25_fuzzy_sql)."""
    from flatnav_spark.query import prefix_query_batch

    idx = _engine_index_for(spark, sf_dir)

    def runner(qdf_, kk):
        return prefix_query_batch(spark, idx, qdf_, k=kk, prune=True,
                                  scorer="bm25")

    qrows = [
        (qid, " ".join(f"{base}~{d}" for base, d in specs))
        for qid, specs in _FUZZY_QUERIES
    ]
    return _engine_topk(spark, sf_dir, "bm25", runner=runner, qrows=qrows)


_EXT_CACHE: dict = {}


def _topk_by_src_doc_id(spark, idx):
    """Fixture-batch top-k over an index whose paths encode the source
    doc_id (doc/<id>.txt): query, map doc_id back to the source id, rank
    on the ROUNDED score with src-id tie-break — the shared tail of the
    engine_extend/engine_stream oracle entries."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flatnav_spark.query import batch_query

    qrows = [(qid, " ".join(terms)) for qid, terms in _BM25_QUERIES]
    qdf = spark.createDataFrame(qrows, "query_id long, query_text string")
    res = batch_query(spark, idx, qdf, k=_K + 10, prune=True)
    src = idx.docs(spark).select(
        "doc_id",
        F.regexp_extract("path", r"doc/(\d+)\.txt", 1).cast("long").alias("src_doc_id"),
    )
    joined = res.join(src, "doc_id").select("query_id", "src_doc_id", "score")
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("score", 4)), F.asc("src_doc_id")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _K)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("src_doc_id").cast("long").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
    )


def engine_extend_topk(spark, sf_dir: str):
    """Incremental-extend parity through the driver oracle: build over the
    first ~80% of `documents`, extend_index with the rest, query — results
    must hash-equal the SQL oracle over the FULL corpus (extend semantics
    == fresh build over the grown corpus, but computed via the append-only
    O(new docs) generation path, flatnav_spark/build.py)."""
    from pyspark.sql import functions as F

    from flatnav_spark.build import build_index, extend_index

    key = os.path.abspath(sf_dir)
    if key not in _EXT_CACHE or not os.path.exists(_EXT_CACHE[key].path):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        cut = int(docs.agg(F.max("doc_id")).collect()[0][0] * 0.8)
        corpus = docs.select(
            F.lit("corpus").alias("repo"),
            F.format_string("doc/%010d.txt", F.col("doc_id")).alias("path"),
            F.sha2(F.col("doc_id").cast("string"), 256).substr(1, 40).alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"),
        )
        is_base = F.regexp_extract("path", r"doc/(\d+)\.txt", 1).cast("long") <= cut
        out = os.path.join(tempfile.mkdtemp(prefix="flatnav_ext_idx_"), "index")
        idx = build_index(corpus.filter(is_base), out, mode="simple",
                          n_splits=1, n_groups=1, block_range=256, out_partitions=4)
        idx = extend_index(spark, idx, corpus.filter(~is_base), out_partitions=4)
        _EXT_CACHE[key] = idx

    return _topk_by_src_doc_id(spark, _EXT_CACHE[key])


_STREAM_CACHE: Dict[str, object] = {}


def engine_stream_topk(spark, sf_dir: str):
    """Streaming-ingest parity through the driver oracle: build over the
    first ~80% of `documents`, drop the rest into a drop-zone as two
    parquet files, drain an availableNow stream_ingest (two micro-batches
    -> two extend generations, flatnav_spark/streaming.py), query — must
    hash-equal the same fresh-build SQL oracle over the FULL corpus
    (streaming == extend == fresh-build semantics)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from flatnav_spark.build import build_index
    from flatnav_spark.index_io import load_index
    from flatnav_spark.streaming import drain, stream_ingest

    key = os.path.abspath(sf_dir)
    if key not in _STREAM_CACHE or not os.path.exists(_STREAM_CACHE[key].path):
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        cut = int(docs.agg(F.max("doc_id")).collect()[0][0] * 0.8)
        corpus = docs.select(
            F.lit("corpus").alias("repo"),
            F.format_string("doc/%010d.txt", F.col("doc_id")).alias("path"),
            F.sha2(F.col("doc_id").cast("string"), 256).substr(1, 40).alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"),
        )
        is_base = F.regexp_extract("path", r"doc/(\d+)\.txt", 1).cast("long") <= cut
        root = tempfile.mkdtemp(prefix="flatnav_stream_idx_")
        out = os.path.join(root, "index")
        build_index(corpus.filter(is_base), out, mode="simple",
                    n_splits=1, n_groups=1, block_range=256, out_partitions=4)
        # drop zone: the tail rows as up to two files -> one micro-batch
        # per non-empty file (tiny fixtures may only fill one)
        drop = os.path.join(root, "drop")
        os.makedirs(drop)
        rows = corpus.filter(~is_base).collect()
        half = len(rows) // 2
        waves = [w for w in (rows[:half], rows[half:]) if w]
        for i, chunk in enumerate(waves):
            cols = list(zip(*[(r.repo, r.path, r.commit, r.lang, r.content) for r in chunk]))
            pq.write_table(pa.table({
                "repo": pa.array(cols[0]), "path": pa.array(cols[1]),
                "commit": pa.array(cols[2]), "lang": pa.array(cols[3]),
                "content": pa.array(cols[4]),
            }), os.path.join(drop, f"w{i}.parquet"))
        drain(stream_ingest(spark, out, drop, os.path.join(root, "ckpt"),
                            max_files_per_trigger=1, out_partitions=4))
        idx = load_index(out)
        assert len(idx.manifest.postings_dirs) == 1 + len(waves), (
            f"expected {len(waves)} stream generations")
        _STREAM_CACHE[key] = idx

    return _topk_by_src_doc_id(spark, _STREAM_CACHE[key])


def engine_service_topk(spark, sf_dir: str):
    """Threshold-reuse parity through the driver oracle (round-5): the
    standing service (flatnav_spark/service.py — the shared-read-only-
    index analog, bindings.cpp:196-212) answers the fixture batch COLD,
    filling its per-query-text threshold cache, then answers the
    IDENTICAL batch SEEDED with each query's attained k-th score. The
    seeded results are asserted equal to the cold ones in-process and
    hashed against the same SQL oracle as engine_bm25_topk — the driver-
    gate proof that threshold reuse is lossless."""
    from flatnav_spark.service import StandingQueryService

    idx = _engine_index_for(spark, sf_dir)

    def runner(qdf_, kk):
        qrows = [(int(r.query_id), r.query_text) for r in qdf_.collect()]
        svc = StandingQueryService(spark, idx, k=kk, preload_stats=False)
        cold = svc.search_batch(qrows)
        assert svc.cached_thresholds > 0
        seeded = svc.search_batch(qrows)
        assert seeded == cold, "threshold-seeded repeat diverged from cold run"
        rows = [(qid, d, s) for qid, hits in seeded.items()
                for (_rk, d, s) in hits]
        return spark.createDataFrame(
            rows, "query_id long, doc_id long, score double")

    return _engine_topk(spark, sf_dir, "bm25", runner=runner)


def engine_phrase_topk(spark, sf_dir: str):
    """Phrase search through the REAL engine artifacts: build_positions
    over the cached parity index (simple mode, internal doc_id == source
    doc_id by the fixture shaping), phrase_query_batch on the _PHRASES
    set, source ids restored via the docs-table path join — hash-gated
    against the generated join-based DuckDB oracle. All-integer outputs:
    no rounding slack needed (unlike the BM25 entries), and the
    (n_occ desc, doc_id asc) tie-break is identical on both sides."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flatnav_spark.phrase import build_positions, phrase_query_batch

    idx = _engine_index_for(spark, sf_dir)
    if not idx.manifest.positions_dir:
        build_positions(spark, _engine_corpus(spark, sf_dir), idx)
    qdf = spark.createDataFrame(
        [(qid, p) for qid, p in _PHRASES], "query_id long, phrase_text string")
    res = phrase_query_batch(spark, idx, qdf, k=_K)
    src = idx.docs(spark).select(
        "doc_id",
        F.regexp_extract("path", r"doc/(\d+)\.txt", 1).cast("long").alias("src_doc_id"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_occ"), F.asc("src_doc_id"))
    return (
        res.join(src, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("src_doc_id").cast("long").alias("doc_id"),
            F.col("n_occ").cast("long").alias("n_occ"),
        )
    )


def engine_phrase_slop_topk(spark, sf_dir: str):
    """Ordered-proximity (slop) search through the REAL engine: the same
    cached parity index + positions artifact as engine_phrase_topk, the
    same _PHRASES set, but phrase_query_batch(slop=_PHRASE_SLOP) — gated
    against the chain-join DuckDB oracle (_phrase_slop_sql). Proves the
    reachable-set fold in phrase.py:_slop_occurrences equals the SQL
    chain-enumeration semantics on real data, not just unit fixtures."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flatnav_spark.phrase import build_positions, phrase_query_batch

    idx = _engine_index_for(spark, sf_dir)
    if not idx.manifest.positions_dir:
        build_positions(spark, _engine_corpus(spark, sf_dir), idx)
    qdf = spark.createDataFrame(
        [(qid, p) for qid, p in _PHRASES], "query_id long, phrase_text string")
    res = phrase_query_batch(spark, idx, qdf, k=_K, slop=_PHRASE_SLOP)
    src = idx.docs(spark).select(
        "doc_id",
        F.regexp_extract("path", r"doc/(\d+)\.txt", 1).cast("long").alias("src_doc_id"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_occ"), F.asc("src_doc_id"))
    return (
        res.join(src, "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("rank").cast("long").alias("rank"),
            F.col("src_doc_id").cast("long").alias("doc_id"),
            F.col("n_occ").cast("long").alias("n_occ"),
        )
    )


def engine_tfidf_topk(spark, sf_dir: str):
    """The second scorer (TF-IDF inner product, the IP-metric analog)
    through the REAL engine against a pure-SQL oracle — proof the
    scorer.py seam is a working two-variant interface like flatnav's
    DistanceInterface (DistanceInterface.h:14)."""
    return _engine_topk(spark, sf_dir, "tfidf_ip")


def build_queries() -> Dict[str, Callable]:
    out: Dict[str, Callable] = {}
    for name, (spark_impl, _duck, tables) in _registry().items():
        out[name] = spark_impl if callable(spark_impl) else _make_sql_query(spark_impl, tables)
    out["engine_bm25_topk"] = engine_bm25_topk
    out["engine_prefix_topk"] = engine_prefix_topk
    out["engine_fuzzy_topk"] = engine_fuzzy_topk
    out["engine_tfidf_topk"] = engine_tfidf_topk
    out["engine_phrase_topk"] = engine_phrase_topk
    out["engine_phrase_slop_topk"] = engine_phrase_slop_topk
    out["engine_extend_topk"] = engine_extend_topk
    out["engine_stream_topk"] = engine_stream_topk
    out["engine_service_topk"] = engine_service_topk
    out["lsh_ann_topk"] = lsh_ann_topk
    out["ivf_ann_topk"] = ivf_ann_topk
    out["embedding_near_dup"] = embedding_near_dup
    out["multimodal_decode"] = multimodal_decode
    out["multimodal_features"] = multimodal_features
    return out


def build_oracles() -> Dict[str, str]:
    out: Dict[str, str] = {}
    for name, (_spark, duck_sql, _tables) in _registry().items():
        out[name] = duck_sql
    out["engine_bm25_topk"] = _bm25_sql("duck", with_doc_id=True)
    # prefix queries == the in-SQL LIKE vocabulary expansion
    out["engine_prefix_topk"] = _bm25_prefix_sql("duck")
    # fuzzy queries == the in-SQL levenshtein vocabulary expansion
    out["engine_fuzzy_topk"] = _bm25_fuzzy_sql("duck")
    out["engine_tfidf_topk"] = _tfidf_sql("duck", with_doc_id=True)
    # phrase search == the join-based positional formulation
    out["engine_phrase_topk"] = _phrase_sql("duck")
    # proximity search == the chain-join formulation at the same slop
    out["engine_phrase_slop_topk"] = _phrase_slop_sql("duck")
    # extend == fresh-build semantics over the grown corpus: same oracle
    out["engine_extend_topk"] = _bm25_sql("duck", with_doc_id=True)
    # streaming ingest == extend == fresh-build semantics: same oracle
    out["engine_stream_topk"] = _bm25_sql("duck", with_doc_id=True)
    # seeded repeat == cold run == fresh BM25 semantics: same oracle
    out["engine_service_topk"] = _bm25_sql("duck", with_doc_id=True)
    out["multimodal_decode"] = _MULTIMODAL_DECODE_ORACLE
    out["multimodal_features"] = _MULTIMODAL_FEATURES_ORACLE
    from flatnav_spark.simsearch import lsh_duckdb_oracle_sql

    out["lsh_ann_topk"] = lsh_duckdb_oracle_sql(
        dim=64, k=5, n_planes=32, n_bands=8, query_filter="vec_id < 3"
    )
    from flatnav_spark.simsearch import ivf_duckdb_oracle_sql

    out["ivf_ann_topk"] = ivf_duckdb_oracle_sql(
        dim=64, k=5, n_clusters=8, nprobe=3, n_iters=2, query_filter="vec_id < 3"
    )
    from flatnav_spark.simsearch import near_dup_duckdb_oracle_sql

    out["embedding_near_dup"] = near_dup_duckdb_oracle_sql(
        dim=64, threshold=0.4, n_planes=32, n_bands=8
    )
    return out
