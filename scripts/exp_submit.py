"""Package + launch the real ``spark-submit --py-files`` job (north rule).

Builds ``build/graphiti_spark.zip`` from the package source, launches
``scripts/job_submit.py`` through the ACTUAL ``$SPARK_HOME/bin/
spark-submit`` binary as a subprocess — a separate driver JVM, the
archive shipped to executor Python workers exactly as on a cluster edge
node — then re-runs the same input in-process and asserts the two
builds produce IDENTICAL row counts (the pipeline is deterministic
across masters/parallelism; SURVEY.md §7 risk 1).

Defaults run two real executor JVMs (``local-cluster[2,4,4096]``) over
the sf0.001 corpus. Results → BENCH_SUBMIT.json.

Run: python scripts/exp_submit.py [--sf-dir data/transcripts_sf0.001]
     [--master 'local-cluster[2,4,4096]']
"""

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_zip() -> str:
    build_dir = os.path.join(REPO, "build")
    os.makedirs(build_dir, exist_ok=True)
    return shutil.make_archive(
        os.path.join(build_dir, "graphiti_spark"), "zip",
        root_dir=REPO, base_dir="graphiti_spark")


def spark_submit_bin() -> str:
    home = os.environ.get("SPARK_HOME")
    if not home:
        from pyspark.find_spark_home import _find_spark_home
        home = _find_spark_home()
    return os.path.join(home, "bin", "spark-submit")


def run_submit(zip_path: str, transcripts: str, master: str) -> dict:
    cmd = [
        spark_submit_bin(),
        "--master", master,
        "--conf", "spark.sql.shuffle.partitions=16",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "job_submit.py"),
        "--transcripts", transcripts,
    ]
    # Neutral cwd: the job must see graphiti_spark ONLY through the zip.
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(cmd, capture_output=True, text=True,
                          cwd="/tmp", env=env, timeout=1200)
    lines = [ln for ln in proc.stdout.splitlines()
             if ln.startswith('{"metric"')]
    if proc.returncode != 0 or not lines:
        sys.stderr.write(proc.stdout[-4000:] + proc.stderr[-4000:])
        raise SystemExit(f"spark-submit failed (rc={proc.returncode})")
    return json.loads(lines[-1])


def run_inprocess(transcripts: str) -> dict:
    from graphiti_spark.plans.pipeline import build_graph
    from graphiti_spark.session import get_spark, ship_package
    spark = get_spark(app="submit_check", cores=8)
    ship_package(spark)
    spark.sparkContext.setLogLevel("ERROR")
    g = build_graph(spark, spark.read.parquet(transcripts))
    counts = {
        "episodes": g.episodes.count(),
        "entities": g.entities.count(),
        "edges": g.edges.count(),
        "episodic_edges": g.episodic_edges.count(),
    }
    spark.stop()
    return counts


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(
        REPO, "data", "transcripts_sf0.001"))
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument("--skip-check", action="store_true",
                    help="skip the in-process equality re-run")
    a = ap.parse_args()
    transcripts = os.path.join(a.sf_dir, "transcripts.parquet")

    zip_path = build_zip()
    print(f"zip: {zip_path}", flush=True)
    sub = run_submit(zip_path, transcripts, a.master)
    print(f"spark-submit [{a.master}]: {json.dumps(sub)}", flush=True)

    result = {"submit": sub, "master": a.master, "sf_dir": a.sf_dir}
    if not a.skip_check:
        local = run_inprocess(transcripts)
        match = all(sub[k] == v for k, v in local.items())
        print(f"in-process counts: {json.dumps(local)}  "
              f"{'MATCH' if match else 'MISMATCH'}")
        result["inprocess"] = local
        result["counts_match"] = match
        if not match:
            raise SystemExit("submit vs in-process count mismatch")
    with open(os.path.join(REPO, "BENCH_SUBMIT.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
