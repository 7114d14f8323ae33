#!/usr/bin/env python3
"""Generate the sf1 confidence-sweep dataset (10x sf0.1) under
testdata_sf1/ by deterministic replication of the driver's sf0.1 tables
with key offsets. Replica texts and embeddings are regenerated from the
same processes (31-token vocabulary draws / cluster-preserving jitter) so
similarity densities match the driver corpus. Never touches /root/testdata.
"""
import duckdb, hashlib, os, sys

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/testdata_sf1"
R = 10       # replicas for the star schema + events + documents
R_EMB = 4    # embeddings follow the 0.01->0.1 ratio (x4)

con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SRC}/{t}.parquet')")

def copy(sql, name):
    con.execute(f"COPY ({sql}) TO '{DST}/{name}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{name}.parquet')").fetchone()[0]
    print(f"{name}: {n}")

# key strides (max+1 per table, so replicas never collide)
def stride(table, col):
    return con.execute(f"SELECT max({col}) + 1 FROM {table}").fetchone()[0]
sc, ss, sp, so, se, su, sd = (stride("customer","c_custkey"), stride("supplier","s_suppkey"),
    stride("part","p_partkey"), stride("orders","o_orderkey"),
    stride("events","event_id"), stride("events","user_id"), stride("documents","doc_id"))

copy("SELECT * FROM region", "region")
copy("SELECT * FROM nation", "nation")
ks = f"(SELECT unnest(generate_series(0, {R-1})) AS k)"
copy(f"SELECT c_custkey + k*{sc} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer, {ks}", "customer")
copy(f"SELECT s_suppkey + k*{ss} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier, {ks}", "supplier")
copy(f"SELECT p_partkey + k*{sp} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part, {ks}", "part")
copy(f"""SELECT o_orderkey + k*{so} AS o_orderkey, o_custkey + k*{sc} AS o_custkey,
  o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders, {ks}""", "orders")
copy(f"""SELECT l_orderkey + k*{so} AS l_orderkey, l_partkey + k*{sp} AS l_partkey,
  l_suppkey + k*{ss} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice,
  l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM lineitem, {ks}""", "lineitem")
copy(f"""SELECT event_id + k*{se} AS event_id, ts, user_id + k*{su} AS user_id,
  event_type, value, props FROM events, {ks}""", "events")

# documents: replica 0 verbatim; replicas 1..9 regenerate the text from the
# same 31-token vocabulary with the source doc's token count (md5-seeded)
vocab = [r[0] for r in con.execute(
    "SELECT DISTINCT unnest(string_split(text,' ')) AS tk FROM documents ORDER BY tk").fetchall()]
assert len(vocab) == 31, len(vocab)
src_docs = con.execute("SELECT doc_id, text, lang, source FROM documents ORDER BY doc_id").fetchall()
rows = []
for doc_id, text, lang, source in src_docs:
    ntok = len(text.split(" "))
    rows.append((doc_id, text, lang, source, len(text)))
    for k in range(1, R):
        nid = doc_id + k * sd
        toks = []
        h = b""
        i = 0
        while len(toks) < ntok:
            h = hashlib.md5(f"{nid}:{i}".encode()).digest()
            for b in h:
                if len(toks) >= ntok: break
                toks.append(vocab[b % 31])
            i += 1
        t2 = " ".join(toks)
        rows.append((nid, t2, lang, source, len(t2)))
con.execute("CREATE TABLE docs_sf1 (doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO docs_sf1 VALUES (?,?,?,?,?)", rows)
copy("SELECT * FROM docs_sf1 ORDER BY doc_id", "documents")

# embeddings: replica 0 verbatim; replicas jitter each component by a
# deterministic md5 noise in [-0.05, 0.05] (cluster/label structure kept)
sv = stride("embeddings","vec_id")
src_emb = con.execute("SELECT vec_id, embedding, label FROM embeddings ORDER BY vec_id").fetchall()
erows = []
for vec_id, emb, label in src_emb:
    erows.append((vec_id, list(emb), label))
    for k in range(1, R_EMB):
        nid = vec_id + k * sv
        out = []
        for i, v in enumerate(emb):
            hv = int.from_bytes(hashlib.md5(f"{nid}:{i}".encode()).digest()[:4], "big")
            out.append(float(v) + (hv / 2**32 - 0.5) * 0.1)
        erows.append((nid, out, label))
con.execute("CREATE TABLE emb_sf1 (vec_id BIGINT, embedding FLOAT[], label INTEGER)")
con.executemany("INSERT INTO emb_sf1 VALUES (?,?,?)", erows)
copy("SELECT * FROM emb_sf1 ORDER BY vec_id", "embeddings")
print("done")
