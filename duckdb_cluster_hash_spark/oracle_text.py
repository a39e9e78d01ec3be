"""Generated DuckDB oracle SQL for the text/dedup/similarity operators.

Each builder mirrors, in pure DuckDB SQL, the exact algorithm of the
corresponding Spark operator in operators/dedup.py / operators/similarity.py
— same shingling, same md5-derived 60-bit hashes, same LSH banding, same
majority-vote SimHash — so the driver's value-hash comparison checks the
*algorithm*, not just row counts.
"""

from __future__ import annotations


def shingles_cte(n: int = 3, table: str = "documents") -> str:
    """CTEs producing ``shingled(doc_id, sh)``: distinct word n-gram lists.

    Matches operators.dedup.word_ngrams: texts shorter than n words fall
    back to a single whole-text shingle.
    """
    gram = " || ' ' || ".join(f"ws[i+{j}]" if j else "ws[i]" for j in range(n))
    return (
        f"words AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM {table}), "
        f"shingled AS (SELECT doc_id, CASE WHEN len(ws) >= {n} THEN "
        f"list_distinct([{gram} FOR i IN range(1, len(ws) - {n - 2})]) "
        f"ELSE [text] END AS sh FROM words)"
    )


_JACC = "round(CAST(inter AS DOUBLE) / (size_a + size_b - inter), 4)"


def ngram_jaccard_pairs_sql(n: int = 3, threshold: float = 0.2) -> str:
    """All-pairs word-n-gram Jaccard >= threshold (cross-join oracle)."""
    return (
        f"WITH {shingles_cte(n)}, "
        "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "len(list_intersect(a.sh, b.sh)) AS inter, "
        "len(a.sh) AS size_a, len(b.sh) AS size_b "
        "FROM shingled a JOIN shingled b ON a.doc_id < b.doc_id) "
        f"SELECT doc_a, doc_b, {_JACC} AS jacc "
        f"FROM pairs WHERE {_JACC} >= {threshold}"
    )


def _h60_sql(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def minhash_neardup_pairs_sql(
    n: int = 3, k: int = 16, bands: int = 8, rows: int = 2, threshold: float = 0.2
) -> str:
    """MinHash signatures -> LSH band collisions -> exact-Jaccard verify."""
    mh_aggs = ", ".join(
        "min(" + _h60_sql(f"'{i}:' || shingle") + f") AS mh{i}" for i in range(k)
    )
    band_list = ", ".join(
        f"md5('{j}|' || "
        + " || ',' || ".join(f"mh{j * rows + r}::VARCHAR" for r in range(rows))
        + ")"
        for j in range(bands)
    )
    return (
        f"WITH {shingles_cte(n)}, "
        "sh AS (SELECT doc_id, unnest(sh) AS shingle FROM shingled), "
        f"mh AS (SELECT doc_id, {mh_aggs} FROM sh GROUP BY doc_id), "
        f"bands AS (SELECT doc_id, unnest([{band_list}]) AS band_hash FROM mh), "
        "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM bands a JOIN bands b ON a.band_hash = b.band_hash AND a.doc_id < b.doc_id), "
        "verified AS (SELECT doc_a, doc_b, "
        "len(list_intersect(sa.sh, sb.sh)) AS inter, "
        "len(sa.sh) AS size_a, len(sb.sh) AS size_b "
        "FROM cand JOIN shingled sa ON cand.doc_a = sa.doc_id "
        "JOIN shingled sb ON cand.doc_b = sb.doc_id) "
        f"SELECT doc_a, doc_b, {_JACC} AS jacc "
        f"FROM verified WHERE {_JACC} >= {threshold}"
    )


def simhash_signatures_cte(table: str = "documents") -> str:
    """CTEs producing ``simhash(doc_id, simhash_lo, simhash_hi)``."""
    sums = ", ".join(
        f"sum((hlo >> {b}) & 1) AS lo{b}, sum((hhi >> {b}) & 1) AS hi{b}"
        for b in range(32)
    )
    lo = " + ".join(
        f"((CASE WHEN 2 * lo{b} > n_tok THEN 1 ELSE 0 END)::BIGINT << {b})"
        for b in range(32)
    )
    hi = " + ".join(
        f"((CASE WHEN 2 * hi{b} > n_tok THEN 1 ELSE 0 END)::BIGINT << {b})"
        for b in range(32)
    )
    return (
        f"tok AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w FROM {table}), "
        "h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS hlo, "
        "('0x' || substr(md5(w), 9, 8))::BIGINT AS hhi FROM tok), "
        f"hagg AS (SELECT doc_id, count(*) AS n_tok, {sums} FROM h GROUP BY doc_id), "
        f"simhash AS (SELECT doc_id, {lo} AS simhash_lo, {hi} AS simhash_hi FROM hagg)"
    )


def simhash_signatures_sql(table: str = "documents") -> str:
    return f"WITH {simhash_signatures_cte(table)} SELECT * FROM simhash"


def simhash_neardup_pairs_sql(max_hamming: int = 6, table: str = "documents") -> str:
    """All pairs with SimHash Hamming distance <= max_hamming."""
    return (
        f"WITH {simhash_signatures_cte(table)} "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "(bit_count(xor(a.simhash_lo, b.simhash_lo)) + "
        "bit_count(xor(a.simhash_hi, b.simhash_hi)))::INTEGER AS hamming "
        "FROM simhash a JOIN simhash b ON a.doc_id < b.doc_id "
        f"WHERE bit_count(xor(a.simhash_lo, b.simhash_lo)) + "
        f"bit_count(xor(a.simhash_hi, b.simhash_hi)) <= {max_hamming}"
    )


def dedup_representatives_sql(table: str = "documents") -> str:
    return (
        f"SELECT md5(text) AS dup_hash, min(doc_id) AS keep_id, "
        f"count(*) AS n_copies FROM {table} GROUP BY md5(text)"
    )


def cosine_topk_sql(query_vec_id: int = 0, k: int = 10, dim: int = 64) -> str:
    """Brute-force cosine top-k against one stored vector.

    Dot/norm are sequential left-folds (list_reduce) over float->double
    casts, matching Spark's F.aggregate fold order bit-for-bit.
    """
    def dot(u: str, v: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0::DOUBLE, "
            f"[{u}[i]::DOUBLE * {v}[i]::DOUBLE FOR i IN range(1, {dim + 1})]), "
            "(acc, x) -> acc + x)"
        )

    return (
        f"WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {query_vec_id}) "
        "SELECT vec_id, label, "
        f"round({dot('embedding', 'qv')} / "
        f"sqrt({dot('embedding', 'embedding')} * {dot('qv', 'qv')}), 6) AS cos_sim "
        "FROM embeddings, q "
        f"ORDER BY cos_sim DESC, vec_id LIMIT {k}"
    )
