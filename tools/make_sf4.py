#!/usr/bin/env python3
"""Synthesize a fourth data decade ("sf1" = 10x sf0.1) of the tables the
near-flag scaling entries read (r12, VERDICT item 2): the sf0.001-0.1
fit leaves dedup_edit_distance / dedup_minhash_error /
dedup_substring_cut / q101_fd_audit at e_bound 1.24-1.29, just under
the 1.3 flag, where three points cannot separate noise from a real
n^1.25. One more decade pins them.

Output: <out>/sf1/{documents,events,orders,lineitem,customer}.parquet
(default /tmp/graft_scale/sf1 — regenerable scratch, never committed).

Construction, calibrated FROM the committed sf0.1 tables so the decade
extends the driver generator's distributions rather than inventing new
ones:

  documents  REGENERATED (not replicated — replication would give every
             doc 9 exact copies and detonate every dedup query's true-
             pair count far beyond how the real data scales):
             - 30-token uniform vocabulary (measured: near-uniform token
               frequencies), doc length uniform on the measured range,
               i.i.d. tokens;
             - lang sampled from the measured sf0.1 distribution;
               source = 'src{doc_id % 20}' (the generator's observed
               round-robin);
             - ~5.3% of docs are CLONES of an earlier doc (measured:
               255 'dup'-token insertions + ~8 exact copies in 5000
               docs): copy + insert the literal token 'dup' at a random
               position (~97%) or copy verbatim (~3%) — reproducing the
               near-dup pair density per doc that drives the LSH-family
               queries, with pair count scaling ~linearly in rows as it
               does across the driver's own sfs.
  events     10 replicas, event_id/user_id shifted by the observed
             maxima (matches the driver: 10x rows AND 10x users per
             decade, same 30-day window).
  orders     10 replicas, o_orderkey/o_custkey shifted.
  lineitem   10 replicas, l_orderkey/l_partkey/l_suppkey shifted (FK
             structure preserved; group-size distributions per key are
             those of sf0.1, key cardinality x10 — exactly how TPC-H
             scales).
  customer   10 replicas, c_custkey shifted.
  part       10 replicas, p_partkey shifted (the same max+1 shift
             lineitem's l_partkey uses, so the FK structure holds).
  supplier   10 replicas, s_suppkey shifted (ditto for l_suppkey).
  nation     copied verbatim (constant across the driver's sfs).
  region     copied verbatim.

  embeddings SMOKE-GRADE only: 10 replicas with vec_id shifts and a
             deterministic alternating sign-flip perturbation per
             replica (so replicas are not exact duplicate vectors). The
             driver scales this table 4x (not 10x) per decade, so it
             does NOT fit the rows-proportional-to-sf exponent model —
             sim_* stays on the three-decade fit and the sf1 slice
             exists only so embeddings-backed queries (the kNN graph
             suite) can RUN in the full-surface sf1 smoke.

Deterministic: seed fixed, replica shifts pure arithmetic.
"""
import os
import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
SEED = 20260816


def gen_documents(con, out_dir):
    vocab = [r[0] for r in con.sql(
        f"select tok, count(*) c from (select unnest(string_split(text,' ')) tok "
        f"from '{SRC}/documents.parquet') t where tok != 'dup' "
        f"group by tok order by tok").fetchall()]
    lens = con.sql(
        f"select len(string_split(text,' ')) l, count(*) c from "
        f"'{SRC}/documents.parquet' where not contains(text, 'dup') "
        f"group by l order by l").fetchall()
    lo, hi = min(r[0] for r in lens), max(r[0] for r in lens)
    langs = con.sql(
        f"select lang, count(*) from '{SRC}/documents.parquet' group by lang "
        f"order by lang").fetchall()
    lang_names = [r[0] for r in langs]
    lang_weights = [r[1] for r in langs]
    n_src, n_out = con.sql(
        f"select count(distinct source), {REPLICAS} * count(*) "
        f"from '{SRC}/documents.parquet'").fetchall()[0]
    clone_p = 0.053
    exact_p = 0.03  # of clones

    rng = random.Random(SEED)
    rows = []
    for doc_id in range(n_out):
        if rows and rng.random() < clone_p:
            base = rows[rng.randrange(len(rows))][1].split(" ")
            if rng.random() >= exact_p:
                base = base[:]
                base.insert(rng.randrange(len(base) + 1), "dup")
            text = " ".join(base)
        else:
            text = " ".join(rng.choice(vocab) for _ in range(rng.randint(lo, hi)))
        rows.append((doc_id, text, rng.choices(lang_names, lang_weights)[0],
                     f"src{doc_id % n_src}", len(text)))
    import pandas as pd
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    con.register("docs_gen", df)
    con.sql(f"COPY (SELECT doc_id, text, lang, source, n_chars FROM docs_gen "
            f"ORDER BY doc_id) TO '{out_dir}/documents.parquet' (FORMAT parquet)")
    print(f"documents: {n_out} rows ({sum(1 for r in rows if 'dup' in r[1].split())} dup-insert clones)")


def replicate(con, out_dir, table, shifts):
    """shifts: {column: shift_amount} — the amount is the REFERENCED
    key domain's max+1 (computed once per domain in main), not this
    table's own max: shifting a foreign key by the referencing table's
    max breaks the FK whenever the top referenced key is unreferenced
    (TPC-H-style generators leave some customers orderless), scattering
    every replica's keys between ranges and silently corrupting the
    join cardinalities the scaling fit assumes scale 10x."""
    cols = [r[0] for r in con.sql(
        f"describe select * from '{SRC}/{table}.parquet'").fetchall()]
    sel = [f"{c} + r.r * {shifts[c]} AS {c}" if c in shifts else c for c in cols]
    con.sql(f"COPY (SELECT {', '.join(sel)} FROM '{SRC}/{table}.parquet', "
            f"range({REPLICAS}) r(r)) TO '{out_dir}/{table}.parquet' (FORMAT parquet)")
    n = con.sql(f"select count(*) from '{out_dir}/{table}.parquet'").fetchall()[0][0]
    print(f"{table}: {n} rows")


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_scale/sf1"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    gen_documents(con, out_dir)
    # One shift per KEY DOMAIN, computed from the domain's OWNING table,
    # applied identically to every referencing column.
    def domain(table, col):
        return con.sql(f"select max({col}) + 1 from '{SRC}/{table}.parquet'").fetchall()[0][0]
    cust = domain("customer", "c_custkey")
    part_k = domain("part", "p_partkey")
    supp = domain("supplier", "s_suppkey")
    ordk = domain("orders", "o_orderkey")
    ev = domain("events", "event_id")
    # user_id is events' own domain (no user table); users x10/decade is
    # the observed driver scaling
    usr = domain("events", "user_id")
    replicate(con, out_dir, "events", {"event_id": ev, "user_id": usr})
    replicate(con, out_dir, "orders", {"o_orderkey": ordk, "o_custkey": cust})
    replicate(con, out_dir, "lineitem",
              {"l_orderkey": ordk, "l_partkey": part_k, "l_suppkey": supp})
    replicate(con, out_dir, "customer", {"c_custkey": cust})
    replicate(con, out_dir, "part", {"p_partkey": part_k})
    replicate(con, out_dir, "supplier", {"s_suppkey": supp})
    for dim in ("nation", "region"):  # constant across the driver's sfs
        con.sql(f"COPY (SELECT * FROM '{SRC}/{dim}.parquet') "
                f"TO '{out_dir}/{dim}.parquet' (FORMAT parquet)")
        print(f"{dim}: copied verbatim")
    # smoke-grade embeddings (see module docstring): replicas with shifted
    # ids and a per-replica alternating sign flip — NOT exponent-fit data
    mx = con.sql(f"select max(vec_id) from '{SRC}/embeddings.parquet'").fetchall()[0][0]
    con.sql(f"""
      COPY (
        SELECT vec_id + r.r * {mx + 1} AS vec_id,
               CASE WHEN r.r = 0 THEN embedding
                    ELSE list_transform(embedding, (x, i) ->
                      CAST(CASE WHEN (i + r.r) % 7 = 0 THEN -x ELSE x END AS FLOAT))
               END AS embedding,
               label
        FROM '{SRC}/embeddings.parquet', range({REPLICAS}) r(r)
      ) TO '{out_dir}/embeddings.parquet' (FORMAT parquet)""")
    n = con.sql(f"select count(*) from '{out_dir}/embeddings.parquet'").fetchall()[0][0]
    print(f"embeddings: {n} rows (smoke-grade)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
