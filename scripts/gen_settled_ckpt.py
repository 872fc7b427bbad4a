"""Generate (or refresh) the committed bench settled-state checkpoint.

Runs the exact bench settle path (bench.physics_steady_setup) on whatever
backend is active — on the real TPU this is one compile + ~900 cheap steps
now that the settle config seeds the known steady capacities. The resulting
.settled_bench_<digest>.pkl is committed to git so the driver's bench run
never re-settles from scratch (round-3 failure mode: BENCH_r03.json rc=124).

Usage:  python scripts/gen_settled_ckpt.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402  (configures the jax compile cache)


def main():
    t0 = time.time()
    state, params, steady_base, ladder = bench.physics_steady_setup()
    print(f"settle+setup done in {time.time() - t0:.1f} s")
    print(f"steady_base pair_capacity={steady_base.pair_capacity} "
          f"contact_capacity={steady_base.contact_capacity} "
          f"gs_cmax={steady_base.gs_cmax}")
    import numpy as np
    cnt = np.asarray(state.pair_count)
    print(f"state counts: pairs={int(cnt[0])} contacts={int(cnt[1])}")


if __name__ == "__main__":
    main()
