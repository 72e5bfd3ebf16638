#!/usr/bin/env python3
"""sf1-scale oracle check for the prefix-filtered dedup family (x4/x20/x28).

Usage: python3 tools/sf1check.py <sfDir> <verifyOutDir>

The committed x4/x20 oracles brute-force every within-lang doc pair with a
list_intersect — exact and fully independent, but O(n^2 * len): at the 50k-doc
sf1 fixture that is ~2*10^8 list intersections, which is why the r9 sf1
spot-check skipped these queries. This harness swaps in an sf1-FEASIBLE
independent formulation: the count-everything inverted-index join (posting
self-join grouped by pair), which shares NONE of the Spark engine's prefix /
positional / suffix-bound / salt machinery — precisely the machinery whose
losslessness is under test — and then delegates the actual compare to
selfcheck.py (same canonicalization, same repr-exact float diff as the
driver). x28's committed oracle is already the posting-join shape, so it runs
unmodified.

The df >= 2 prune in the swapped oracles is volume-only and lossless: a
shingle seen in one document can co-occur with nothing, so it contributes to
no pair (doc sizes n_a/n_b still count every shingle).
"""
import sys, os, json, subprocess

R6 = lambda e: f"floor(({e}) * 1000000 + 0.5) / 1000000"

SHINGLE_CTE = """WITH d AS (
  SELECT doc_id, lang, list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS sh
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents)),
sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n FROM d),
p0 AS (SELECT doc_id, lang, unnest(sh) AS shingle FROM d),
df2 AS (SELECT lang, shingle FROM p0 GROUP BY 1, 2 HAVING count(*) >= 2),
p AS (SELECT p0.* FROM p0 JOIN df2 USING (lang, shingle)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang AS lang,
    count(*) AS common
  FROM p a JOIN p b
    ON a.lang = b.lang AND a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3)"""

X4_SQL = f"""{SHINGLE_CTE}
SELECT doc_a, doc_b, lang,
  {R6("CAST(common AS DOUBLE) / (sa.n + sb.n - common)")} AS jaccard
FROM pairs
JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE {R6("CAST(common AS DOUBLE) / (sa.n + sb.n - common)")} >= 0.5
ORDER BY doc_a, doc_b"""

X20_SQL = f"""{SHINGLE_CTE}
SELECT doc_a, doc_b, n_a, n_b, common, jaccard, cont_a_in_b, cont_b_in_a
FROM (
  SELECT doc_a, doc_b, sa.n AS n_a, sb.n AS n_b, common,
    {R6("CAST(common AS DOUBLE) / (sa.n + sb.n - common)")} AS jaccard,
    {R6("CAST(common AS DOUBLE) / sa.n")} AS cont_a_in_b,
    {R6("CAST(common AS DOUBLE) / sb.n")} AS cont_b_in_a
  FROM pairs
  JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b)
WHERE greatest(cont_a_in_b, cont_b_in_a) >= 0.4
ORDER BY doc_a, doc_b"""

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    expected = {"x4_dedup_ngram_jaccard", "x20_containment_dedup",
                "x28_weighted_jaccard"}
    missing = {q for q in expected
               if q not in oracle or not os.path.exists(os.path.join(out_dir, q))}
    if missing:
        # an absent result dir means the swapped oracle would "verify"
        # nothing -- fail loudly instead of warning past it
        print(f"FAIL: dump is missing result/oracle for {sorted(missing)}")
        sys.exit(1)
    swapped = {"x4_dedup_ngram_jaccard": X4_SQL,
               "x20_containment_dedup": X20_SQL}
    # x28's committed oracle is already the posting-join formulation.
    # NEVER mutate the dump in place (r10 self-review: the in-place
    # rewrite silently replaced the committed brute-force oracles, so a
    # later plain selfcheck run verified against the swapped formulation
    # while the record claimed the committed one ran): build a shadow
    # dir of symlinks with its own oracle file and check THAT.
    import tempfile
    shadow = tempfile.mkdtemp(prefix="sf1check_")
    for entry in os.listdir(out_dir):
        if entry != "oracle_sql.json":
            os.symlink(os.path.join(os.path.abspath(out_dir), entry),
                       os.path.join(shadow, entry))
    json.dump({**oracle, **swapped},
              open(os.path.join(shadow, "oracle_sql.json"), "w"))
    rc = subprocess.call([sys.executable,
                          os.path.join(os.path.dirname(__file__), "selfcheck.py"),
                          sf_dir, shadow])
    sys.exit(rc)

if __name__ == "__main__":
    main()
