#!/bin/bash
# Full evaluation chain on one finished run (reference eval.sh equivalent)
RUN=${1:?usage: eval.sh <rundir> <gt_traj> [gt_mesh]}
python tsdf_integrate.py --rundir "$RUN"
python - <<PY
import numpy as np, sys, json
sys.path.insert(0, ".")
from cut3r_slam_tpu.utils.eval import ate_rmse
gt = np.loadtxt("$2"); est = np.loadtxt("$RUN/traj_kf.txt")
n = min(len(gt), len(est))
print(json.dumps({"ate_rmse_m": ate_rmse(est[:n,1:4], gt[:n,1:4] if gt.shape[1]<9 else gt[:n].reshape(-1,4,4)[:, :3, 3])}))
PY
[ -n "$3" ] && python scripts/eval_recon.py --rec "$RUN/mesh.ply" --gt "$3" --align
