"""One-off round-3 scaling refresh: re-measure the primary 2->8 pair at
repl=64 (5 reps, interleaved order-alternated protocol) plus a repl=128
pair (3 reps) evidencing the Amdahl serial-fraction lift, and MERGE the
results into BENCH_SCALING.json (keeping pair_4_16 + skew_tournament
from the last full run)."""
import json
import sys

sys.path.insert(0, "tools")
from bench_scaling import scaling_pair  # noqa: E402

sf_dir = "/root/testdata/sf0.1"

with open("BENCH_SCALING.json") as f:
    res = json.load(f)

pair64 = scaling_pair(2, sf_dir, 64, 5)
res.update(pair64)
res["reps"] = 5
res["pair_repl128"] = {"replication": 128,
                       **scaling_pair(2, sf_dir, 128, 3)}
res["note_r3"] = ("2->8 pairs re-measured after the round-3 serial-"
                  "fraction work (fused clock advance, narrowed enqueue "
                  "checkpoint); pair_4_16 + skew kept from the prior "
                  "pass. pair_repl128 doubles the input to show the "
                  "parallel fraction dominating (Amdahl).")

print(json.dumps({k: res[k] for k in
                  ("scaling_efficiency", "min_based_efficiency",
                   "per_rep_efficiencies")}, indent=2))
print(json.dumps({k: res["pair_repl128"][k] for k in
                  ("scaling_efficiency", "min_based_efficiency",
                   "per_rep_efficiencies")}, indent=2))
with open("BENCH_SCALING.json", "w") as f:
    json.dump(res, f, indent=2)
print("MERGED")
