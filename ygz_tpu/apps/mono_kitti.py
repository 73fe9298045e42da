"""Monocular KITTI driver (reference Examples/Monocular/mono_kitti.cc)."""

from ygz_tpu.apps import runner
from ygz_tpu.pipeline.system import System, MONOCULAR
from ygz_tpu.utils import datasets
from ygz_tpu.utils.config import load_config


def main(argv=None):
    args = runner.make_parser("mono_kitti").parse_args(argv)
    cfg = load_config(args.settings, **runner.config_overrides(args))
    sys_ = System(cfg, vocab=runner.load_vocab(args.vocabulary, cfg),
                  sensor=MONOCULAR, use_loop_closing=not args.no_loop,
                  pipelined=args.pipelined)
    frames = datasets.load_kitti_mono(args.sequence)
    runner.run_sequence(sys_, frames, args,
                        lambda s, it: s.track_monocular(it[1], it[0]))


if __name__ == "__main__":
    main()
