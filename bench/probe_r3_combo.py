"""bq_sorted perf + adaptive EMD on TPU (one run to serialize TPU use)."""
import runpy, sys
print("=== bq_sorted ===", flush=True)
runpy.run_path("/root/repo/bench/probe_r3_bq_sorted.py")
print("=== adaptive EMD ===", flush=True)
runpy.run_path("/root/repo/bench/probe_r3_emd.py")
