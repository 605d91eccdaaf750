import duckdb, os
src = '/root/testdata/sf0.1'
dst = '/tmp/graft_testdata/sf10'
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}/{t}.parquet')")
bases = {}
for t,k in [('customer','c_custkey'),('supplier','s_suppkey'),('part','p_partkey'),
            ('orders','o_orderkey'),('events','event_id'),('documents','doc_id'),
            ('embeddings','vec_id')]:
    bases[t] = con.execute(f"SELECT max({k})+1 FROM {t}").fetchone()[0]
umax = con.execute("SELECT max(user_id)+1 FROM events").fetchone()[0]
C,S,P,O,E,D,V = bases['customer'],bases['supplier'],bases['part'],bases['orders'],bases['events'],bases['documents'],bases['embeddings']
copies = "(SELECT unnest(generate_series(0,99)) AS i)"
def emit(name, sql):
    con.execute(f"COPY ({sql}) TO '{dst}/{name}.parquet' (FORMAT PARQUET)")
    print(name, con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{name}.parquet')").fetchone()[0])
# fixed dims: single copy
for t in ['region','nation']:
    emit(t, f"SELECT * FROM {t}")
emit('customer', f"SELECT c_custkey + i*{C} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer, {copies} c")
emit('supplier', f"SELECT s_suppkey + i*{S} AS s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier, {copies} c")
# p_name gets a copy-unique 2-char suffix (pairwise levenshtein >= 2 across
# copies) so d13's intra-copy pair structure replicates without cross-copy pairs
emit('part', f"""SELECT p_partkey + i*{P} AS p_partkey,
  CASE WHEN i=0 THEN p_name ELSE p_name || ' ' || repeat(chr(CAST(97 + i//26 AS INTEGER)),2) || repeat(chr(CAST(97 + i%26 AS INTEGER)),2) END AS p_name,
  p_brand, p_type, p_size, p_retailprice FROM part, {copies} c""")
emit('orders', f"SELECT o_orderkey + i*{O} AS o_orderkey, o_custkey + i*{C} AS o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM orders, {copies} c")
emit('lineitem', f"SELECT l_orderkey + i*{O} AS l_orderkey, l_partkey + i*{P} AS l_partkey, l_suppkey + i*{S} AS l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate FROM lineitem, {copies} c")
emit('events', f"SELECT event_id + i*{E} AS event_id, ts, user_id + i*{umax} AS user_id, event_type, value, props FROM events, {copies} c")
# copy 0 verbatim; copies >=1 prefix every WORD with a copy tag — an
# injective word map, so intra-copy dup/span/jaccard structure replicates
# exactly while cross-copy shingle overlap collapses (no artificial
# cross-copy near-dup pair blowup)
emit('documents', f"""SELECT doc_id + i*{D} AS doc_id,
  CASE WHEN i=0 THEN text
       ELSE array_to_string(list_transform(string_split(text,' '), w -> chr(CAST(97 + i//26 AS INTEGER)) || chr(CAST(97 + i%26 AS INTEGER)) || w), ' ')
  END AS text,
  lang, source,
  CAST(length(CASE WHEN i=0 THEN text
       ELSE array_to_string(list_transform(string_split(text,' '), w -> chr(CAST(97 + i//26 AS INTEGER)) || chr(CAST(97 + i%26 AS INTEGER)) || w), ' ')
  END) AS BIGINT) AS n_chars
  FROM documents, {copies} c""")
# circular dim rotation by copy index: preserves norms and intra-copy
# geometry, decorrelates vectors across copies
emit('embeddings', f"""SELECT vec_id + i*{V} AS vec_id,
  CAST(CASE WHEN i=0 THEN embedding
       ELSE list_concat(embedding[1 + (i-1)%63 + 1:], embedding[1:1 + (i-1)%63]) END AS FLOAT[]) AS embedding,
  label FROM embeddings, {copies} c""")
