#!/usr/bin/env python3
"""Degenerate-corpus differential gate (r13).

The round-12/13 ADVICE findings (x35 singleton-label NaN, e9 single-day
type) shared one shape: an expression both engines compute fine on the
SHIPPED fixtures diverges on a degenerate population the fixtures never
contain — 0/0 sample variance, division by a zero norm, an empty text.
The committed oracles can't catch what the data never exercises. This
gate mechanizes that lens: build a fixture that IS the shipped sf0.001
data PLUS a battery of degenerate rows, run the FULL graft.Verify dump
on it, and hash-compare every oracled query against DuckDB — any
engine disagreement on the degenerate population fails loudly.

Degenerate rows appended (ids far above the shipped range so they
can't collide):

  documents: empty text, single word, "ab ab" (all-dup words), digits
    only, one very long word, a singleton lang, a pair of byte-exact
    duplicate docs, a doc that exactly equals a shipped doc's text
    (cross-population exact dup), whitespace-only-ish single space,
    NULL text (r14 — distinct contract from empty text).
  media (r14 — documents ARE the media population via the adapter):
    a one-frame video (exactly one 64-byte frame at m3's 32x2
    geometry), an all-identical-frames video (one 64-byte block
    repeated), two silence-only audio payloads (constant bytes - the
    m4 envelope hash is 0 for EVERY constant payload, so two different
    constants collide at hamming 0; the oracle must agree on the
    collision, not just on healthy hashes).
  embeddings: an all-zero vector (norm 0 — unit-normalization division),
    a singleton label, two identical vectors (distance ties), a vector
    with negative components only.
  events: a singleton event type with ONE day (n=1 moment guards), a
    same-user same-timestamp tie (e15 session determinism), a
    type whose every event is the same instant, a zero/negative value,
    an 11-month silence gap inside one type (r14 — interarrival/anomaly
    windows spanning a dead period).
  relational (r14): an order with zero lineitems, a customer with zero
    orders, a zero-quantity/zero-price lineitem on a shipped order —
    the orphan/zero rows 100 TB referential joins actually contain.

  ETL raw-table degenerates (empty fx table, zero-transaction month,
  all-null account_type) are NOT reachable from this gate: the
  cross-engine dump covers the oracled sf-table surface, while the ETL
  pipeline runs on reference-shaped raw CSVs — those corner populations
  are pinned in ScalaTest instead (EtlDegenerateSpec).

Usage: python3 tools/degencheck.py [--work /tmp/graft_degen] [--skip-build]
Exit non-zero on any FAIL; writes <work>/degencheck_manifest.json.
"""
import sys, os, json, shutil, subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"


def build(work):
    import duckdb
    os.makedirs(work, exist_ok=True)
    # dimension tables pass through untouched; customer/orders/lineitem
    # gain degenerate rows below (r14)
    for t in ["region", "nation", "supplier", "part"]:
        shutil.copy(os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(work, f"{t}.parquet"))
    con = duckdb.connect()
    B = 900000000  # degenerate id base, far above any shipped id

    # r14 relational degenerates: referential orphans + zero-value rows.
    # One shipped orderkey hosts the zero-quantity lineitem so it joins.
    some_order = con.execute(
        f"SELECT o_orderkey FROM '{SRC}/orders.parquet' ORDER BY 1 LIMIT 1"
    ).fetchone()[0]
    # the zero-lineitem order must hang off a SHIPPED customer: giving it
    # o_custkey = B+1 would hand the 'customer with zero orders' exactly
    # one order and quietly un-degenerate that corner (r14 review find)
    some_cust = con.execute(
        f"SELECT c_custkey FROM '{SRC}/customer.parquet' ORDER BY 1 LIMIT 1"
    ).fetchone()[0]
    con.execute(f"""
      COPY (
        SELECT * FROM '{SRC}/customer.parquet'
        UNION ALL
        SELECT * FROM (VALUES
          ({B + 1}, 'Customer#degen_no_orders', 0, 0.0, 'BUILDING'))
          v(c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
      ) TO '{work}/customer.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (
        SELECT * FROM '{SRC}/orders.parquet'
        UNION ALL
        SELECT * FROM (VALUES
          ({B + 1}, {some_cust}, 'O', 0.0, TIMESTAMP '1995-06-15 00:00:00',
           '3-MEDIUM'))
          v(o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
            o_orderpriority)
      ) TO '{work}/orders.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (
        SELECT * FROM '{SRC}/lineitem.parquet'
        UNION ALL
        SELECT * FROM (VALUES
          ({some_order}, 1, 1, 99, 0.0, 0.0, 0.0, 0.0, 'N', 'O',
           TIMESTAMP '1995-07-01 00:00:00'),
          ({some_order}, 1, 1, 98, 7.0, 123.45, 0.05, 0.02, 'Z', 'F',
           TIMESTAMP '1995-07-02 00:00:00'))
          v(l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
            l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
            l_shipdate)
      ) TO '{work}/lineitem.parquet' (FORMAT PARQUET)""")

    # one shipped text to duplicate across the population boundary
    base_text = con.execute(
        f"SELECT text FROM '{SRC}/documents.parquet' ORDER BY doc_id LIMIT 1"
    ).fetchone()[0].replace("'", "''")
    longword = "x" * 400
    doc_rows = ",\n".join([
        f"({B + 1}, '', 'en', 'web', 0)",
        f"({B + 2}, 'hello', 'en', 'web', 5)",
        f"({B + 3}, 'ab ab', 'en', 'web', 5)",
        f"({B + 4}, '12345 67890', 'en', 'web', 11)",
        f"({B + 5}, '{longword}', 'en', 'web', 400)",
        f"({B + 6}, 'solitary language row here', 'xx', 'web', 26)",
        f"({B + 7}, 'twin twin twin content row', 'en', 'web', 26)",
        f"({B + 8}, 'twin twin twin content row', 'en', 'books', 26)",
        f"({B + 9}, '{base_text}', 'en', 'web', {len(base_text)})",
        f"({B + 10}, ' ', 'en', 'web', 1)",
        # NULL text (r13 ADVICE: m2's LEFT JOIN oracle would have kept a
        # null-text doc the Spark codec path drops) — distinct from empty
        f"({B + 11}, NULL, 'en', 'web', 0)",
        # media corner rows (r14 — the adapter makes these videos/audio):
        # exactly one 64-byte frame at the 32x2 geometry
        f"({B + 12}, '{'f' * 64}', 'en', 'web', 64)",
        # all-identical frames: one 64-char block repeated 8x
        f"({B + 13}, '{'block of reused frame bytes padded to sixty-four chars exactly!!' * 8}', 'en', 'web', 512)",
        # silence-only audio: constant payloads hash to envelope 0 —
        # TWO different constants must collide identically in both engines
        f"({B + 14}, '{'a' * 300}', 'en', 'web', 300)",
        f"({B + 15}, '{'b' * 300}', 'en', 'web', 300)",
    ])
    con.execute(f"""
      COPY (
        SELECT * FROM '{SRC}/documents.parquet'
        UNION ALL
        SELECT * FROM (VALUES {doc_rows})
          v(doc_id, text, lang, source, n_chars)
      ) TO '{work}/documents.parquet' (FORMAT PARQUET)""")

    dim = con.execute(
        f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    zero = "[" + ",".join(["0.0"] * dim) + "]"
    neg = "[" + ",".join(["-0.25"] * dim) + "]"
    twin = "[" + ",".join(
        [f"{0.1 + 0.01 * (i % 7):.2f}" for i in range(dim)]) + "]"
    emb_rows = ",\n".join([
        f"({B + 1}, {zero}::FLOAT[], 901)",      # zero norm
        f"({B + 2}, {twin}::FLOAT[], 902)",      # identical pair, label 902
        f"({B + 3}, {twin}::FLOAT[], 902)",
        f"({B + 4}, {neg}::FLOAT[], 903)",       # singleton label, negative
    ])
    con.execute(f"""
      COPY (
        SELECT * FROM '{SRC}/embeddings.parquet'
        UNION ALL
        SELECT vec_id, embedding, label FROM (VALUES {emb_rows})
          v(vec_id, embedding, label)
      ) TO '{work}/embeddings.parquet' (FORMAT PARQUET)""")

    # props stays inside the table's uniform {"k": n} contract — e10's
    # oracle documents schema_of_variant as oracled ONLY under a uniform
    # props schema (heterogeneous JSON shapes have no portable oracle);
    # the degenerate axes here are the GROUP populations, not the JSON
    ev_rows = ",\n".join([
        # singleton type, single day, single event (n=1 everywhere)
        f"({B + 1}, TIMESTAMP '2024-03-03 12:00:00', {B + 1}, 'degen_solo', 1.5, '{{\"k\": 1}}')",
        # a type whose every event shares one instant (zero variance)
        f"({B + 2}, TIMESTAMP '2024-03-04 08:00:00', {B + 2}, 'degen_instant', 2.0, '{{\"k\": 2}}')",
        f"({B + 3}, TIMESTAMP '2024-03-04 08:00:00', {B + 3}, 'degen_instant', 0.0, '{{\"k\": 3}}')",
        f"({B + 4}, TIMESTAMP '2024-03-04 08:00:00', {B + 4}, 'degen_instant', -3.25, '{{\"k\": 4}}')",
        # r14: an 11-month dead period inside one type — interarrival
        # max-gap and day-window stats spanning a silence
        f"({B + 5}, TIMESTAMP '2024-01-15 00:00:00', {B + 5}, 'degen_gap', 1.0, '{{\"k\": 5}}')",
        f"({B + 6}, TIMESTAMP '2024-12-15 00:00:00', {B + 6}, 'degen_gap', 2.0, '{{\"k\": 6}}')",
        # r14 review find: SAME-user SAME-timestamp ties — e15's oracle
        # session assignment was nondeterministic without the event_id
        # tiebreaker in its running-sum ORDER BY (both rows must land in
        # ONE session, matching Spark's session_window gap semantics)
        f"({B + 7}, TIMESTAMP '2024-06-01 12:00:00', {B + 7}, 'degen_tie', 1.0, '{{\"k\": 7}}')",
        f"({B + 8}, TIMESTAMP '2024-06-01 12:00:00', {B + 7}, 'degen_tie', 2.0, '{{\"k\": 8}}')",
    ])
    con.execute(f"""
      COPY (
        SELECT * FROM '{SRC}/events.parquet'
        UNION ALL
        SELECT event_id, ts, user_id, event_type, value, props
        FROM (VALUES {ev_rows}) v(event_id, ts, user_id, event_type, value, props)
      ) TO '{work}/events.parquet' (FORMAT PARQUET)""")
    print(f"degen fixture built under {work}")


def main(argv):
    def opt(name, default):
        return argv[argv.index(name) + 1] if name in argv else default
    work = opt("--work", "/tmp/graft_degen")
    out = os.path.join(work, "verify_out")
    if "--skip-build" not in argv:
        build(work)
    rc = subprocess.call(
        ["sbt", "--error", f"runMain graft.Verify {work} {out}"], cwd=REPO)
    result = {"work": work, "verify_rc": rc}
    if rc == 0:
        rc = subprocess.call(
            [sys.executable, os.path.join(REPO, "tools", "selfcheck.py"),
             work, out])
        result["compare_rc"] = rc
    result["result"] = "pass" if rc == 0 else "FAIL"
    json.dump(result, open(os.path.join(work, "degencheck_manifest.json"), "w"),
              indent=1)
    print("DEGENCHECK " + result["result"])
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv))
