# Builds the round-4 scaled-oracle-drill corpus (COVERAGE.md "Round-4 scaled
# oracle drill"): a deterministic 10x scale-up of sf0.1 documents where every
# replica's tokens carry a _r<k> suffix — replicas are mutually unrelated, all
# within-replica relations are preserved. Non-document tables are symlinked
# unchanged. Driver-side tooling (duckdb), not part of the Spark library.
#
#   python3 tools_make_scaled.py [src_sf_dir] [out_dir] [replicas]
#   sbt -batch "runMain graft.Verify <out_dir> /tmp/verify_scaled"
#   SKIP_QUERIES=d_ngram_jaccard,d_cc_components,d_drop_near_cc \
#     python3 tools_check_oracle.py <out_dir> /tmp/verify_scaled
#   (the SKIP rows' DuckDB mirrors are quadratic at drill scale; verify them
#    by replica symmetry instead — see COVERAGE.md)
import duckdb, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/data/sf_scaled10"
k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

os.makedirs(out, exist_ok=True)
for t in ["customer", "lineitem", "nation", "orders", "part", "region",
          "supplier", "events", "embeddings"]:
    dst = f"{out}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{src}/{t}.parquet", dst)

duckdb.connect().execute(f"""
COPY (
  SELECT CAST(r * 1000000 + doc_id AS BIGINT) AS doc_id,
    CASE WHEN text IS NULL THEN NULL
      ELSE array_to_string(list_transform(string_split(text, ' '), t -> t || '_r' || r), ' ')
    END AS text,
    lang, source,
    CAST(CASE WHEN text IS NULL THEN NULL ELSE length(
      array_to_string(list_transform(string_split(text, ' '), t -> t || '_r' || r), ' '))
    END AS BIGINT) AS n_chars
  FROM read_parquet('{src}/documents.parquet'), (SELECT unnest(range({k})) AS r)
  ORDER BY doc_id
) TO '{out}/documents.parquet' (FORMAT PARQUET)
""")
n = duckdb.sql(f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')").fetchone()[0]
print(f"wrote {out}/documents.parquet rows={n}")
