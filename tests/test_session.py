"""get_spark launch-context contract.

Plain-local callers must get EXACTLY `cores` slots (the scaling
bench's local[1]-vs-local[4] children depend on it), while a
spark-submit launch keeps the submitter's --master/--conf — the
library must not silently downgrade a cluster job to local[N].
Each case needs its own JVM, hence subprocesses.
"""

import os
import subprocess
import sys

_PROBE = """
from scalpel_ts_spark.sources.session import get_spark
spark = get_spark("probe", cores=3, shuffle_partitions=5)
print("RESULT", spark.conf.get("spark.master"),
      spark.conf.get("spark.sql.shuffle.partitions"))
spark.stop()
"""


def _run(env_extra: dict) -> tuple[str, str]:
    env = {**os.environ, **env_extra}
    env.pop("PYSPARK_GATEWAY_PORT", None)
    if env.get("PYSPARK_SUBMIT_ARGS") is None:
        env.pop("PYSPARK_SUBMIT_ARGS", None)
    out = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True,
        text=True,
        timeout=180,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT")][-1]
    _, master, shuffle = line.split()
    return master, shuffle


def test_plain_local_gets_exact_core_count():
    master, shuffle = _run({"PYSPARK_SUBMIT_ARGS": None})
    assert (master, shuffle) == ("local[3]", "5")


def test_submitted_master_and_conf_are_respected():
    master, shuffle = _run(
        {
            "PYSPARK_SUBMIT_ARGS": (
                "--master local[2] "
                "--conf spark.sql.shuffle.partitions=9 pyspark-shell"
            )
        }
    )
    assert (master, shuffle) == ("local[2]", "9")
