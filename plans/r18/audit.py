import sys, json, re, time
sys.path.insert(0, "/root/repo")
from update_database_by_wind_spark.session import get_session
from update_database_by_wind_spark.registry import REGISTRY
from update_database_by_wind_spark.plans.explain import formatted_plan
import update_database_by_wind_spark.operators  # noqa

spark = get_session(app_name="r18-audit", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.01"

# declared exceptions: queries whose docstrings declare these nodes
DECLARED_BNLJ = {"l4_cosine_topk_exact", "l4b_cosine_topk_filtered", "j5_cross_join_calendar"}
flags = {}
t0 = time.time()
for i, (name, spec) in enumerate(REGISTRY.items()):
    try:
        df = spec.fn(spark, sf)
        plan = formatted_plan(df)
    except Exception as exc:
        flags[name] = {"ERROR": repr(exc)[:120]}
        continue
    f = {}
    n_py = plan.count("BatchEvalPython") + plan.count("ArrowEvalPython")
    n_map = plan.count("MapInPandas") + plan.count("MapInArrow") + plan.count("FlatMapGroupsInPandas") + plan.count("PythonUDTF") + plan.count("AggregateInPandas")
    if n_py: f["python_eval_nodes"] = n_py // 2
    if n_map: f["python_map_nodes"] = n_map // 2
    if "CartesianProduct" in plan: f["cartesian"] = True
    if "BroadcastNestedLoopJoin" in plan and name not in DECLARED_BNLJ: f["bnlj"] = True
    sp = len(re.findall(r"Exchange SinglePartition", plan)) // 2
    if sp: f["single_partition_exchanges"] = sp
    nexch = len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))
    f["exchanges"] = nexch
    if f.get("python_eval_nodes") or f.get("cartesian") or f.get("bnlj") or f.get("single_partition_exchanges"):
        flags[name] = f
    print(i, name, json.dumps(f), flush=True)
print("AUDIT_DONE", round(time.time()-t0,1))
with open("/tmp/r18/audit_flags.json", "w") as fh:
    json.dump(flags, fh, indent=1)
