"""ATE evaluation CLI (replaces scripts/evaluate_ate.py and
evaluate_ate_scale_euroc.py: SE3 or 7DoF Sim3 alignment + RMSE)."""

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("evaluate_ate")
    p.add_argument("groundtruth", help="TUM-format ground truth")
    p.add_argument("estimate", help="TUM-format estimated trajectory")
    p.add_argument("--scale", action="store_true",
                   help="7DoF Sim3 alignment (monocular)")
    p.add_argument("--max-dt", type=float, default=0.02)
    args = p.parse_args(argv)

    from ygz_tpu.eval import ate
    gt = ate.load_tum_trajectory(args.groundtruth)
    est = ate.load_tum_trajectory(args.estimate)
    res = ate.ate_rmse(est, gt, with_scale=args.scale, max_dt=args.max_dt)
    print(f"absolute_translational_error.rmse {res['rmse']:.6f} m")
    print(f"absolute_translational_error.mean {res['mean']:.6f} m")
    print(f"absolute_translational_error.median {res['median']:.6f} m")
    print(f"pairs {res['n_pairs']}  scale {res['scale']:.6f}")


if __name__ == "__main__":
    main()
