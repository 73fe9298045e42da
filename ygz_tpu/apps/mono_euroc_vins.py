"""Monocular-inertial EuRoC driver (reference
Examples/Monocular/mono_euroc_vins.cc): images + IMU CSV."""

import dataclasses

from ygz_tpu.apps import runner
from ygz_tpu.pipeline.system import System, MONOCULAR
from ygz_tpu.utils import datasets
from ygz_tpu.utils.config import load_config


def main(argv=None):
    args = runner.make_parser("mono_euroc_vins").parse_args(argv)
    cfg = load_config(args.settings, **runner.config_overrides(args))
    cfg = dataclasses.replace(cfg, use_imu=True)
    sys_ = System(cfg, vocab=runner.load_vocab(args.vocabulary, cfg),
                  sensor=MONOCULAR, use_loop_closing=False)
    frames = datasets.load_euroc_mono_vi(args.sequence)
    runner.run_sequence(sys_, frames, args,
                        lambda s, it: s.track_mono_vi(it[1], it[2], it[0]))


if __name__ == "__main__":
    main()
