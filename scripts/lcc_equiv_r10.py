"""Round-10 equivalence harness: supplier_clustering_coefficients
plan rework (wedge join -> degree-oriented adjacency intersection).

Runs BOTH implementations at the sf1 replica in one session and
diffs them with exceptAll in both directions; EQUIVALENT means the
rework inherits the committed replay row's oracle match. Recorded
result (oracle_replay_sf1_r10_addendum.json): diff 0/0 in 915.9 s.
"""
import sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from leader_graph_spark.session import get_spark
from leader_graph_spark.sources.tables import load_table
from leader_graph_spark.plans.graph_queries import supplier_clustering_coefficients

spark = get_spark("lcc_equiv")
sf_dir = "/tmp/sf1.0"

li = load_table(spark, sf_dir, "lineitem")
sp = li.select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")).distinct()
edges = (sp.alias("a").join(sp.alias("b"), (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
    .select(F.col("a.s").alias("u"), F.col("b.s").alias("v")).distinct().localCheckpoint())
deg = (edges.select("u", "v").unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    .groupBy(F.col("u").alias("id")).agg(F.count(F.lit(1)).alias("d")).localCheckpoint())
du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
keyed = edges.join(du, "u").join(dv, "v")
fwd = F.struct(F.col("du"), F.col("u")) < F.struct(F.col("dv"), F.col("v"))
oriented = keyed.select(
    F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
    F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
    F.when(fwd, F.struct(F.col("dv").alias("d"), F.col("v").alias("id")))
    .otherwise(F.struct(F.col("du").alias("d"), F.col("u").alias("id"))).alias("dk"),
).localCheckpoint()
w1, w2 = oriented.alias("w1"), oriented.alias("w2")
wedges = w1.join(w2, (F.col("w1.src") == F.col("w2.src")) & (F.col("w1.dk") < F.col("w2.dk"))
).select(F.col("w1.src").alias("a"), F.col("w1.dst").alias("b"), F.col("w2.dst").alias("c"))
closing = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
tris = wedges.join(closing, ["b", "c"])
per_vertex = (tris.select(F.col("a").alias("id"))
    .unionByName(tris.select(F.col("b").alias("id")))
    .unionByName(tris.select(F.col("c").alias("id")))
    .groupBy("id").agg(F.count(F.lit(1)).alias("t")))
old = (deg.join(per_vertex, "id", "left").where(F.col("d") >= 2)
    .select(F.col("id").alias("supp_id"), F.col("d").cast("bigint").alias("degree"),
        F.coalesce("t", F.lit(0)).cast("bigint").alias("n_triangles"),
        F.expr("CAST((2000000 * COALESCE(t, 0)) div (d * (d - 1)) AS BIGINT)").alias("lcc_ppm")))

t0=time.time()
new = supplier_clustering_coefficients(spark, sf_dir)
d1 = new.exceptAll(old).count()
d2 = old.exceptAll(new).count()
print("diff_new_minus_old", d1, "diff_old_minus_new", d2, "sec", round(time.time()-t0,1))
print("EQUIVALENT" if d1==0==d2 else "DIVERGED")
