"""RGB-D TUM driver (reference Examples/RGB-D/rgbd_tum.cc)."""

from ygz_tpu.apps import runner
from ygz_tpu.pipeline.system import System, RGBD
from ygz_tpu.utils import datasets
from ygz_tpu.utils.config import load_config


def main(argv=None):
    args = runner.make_parser("rgbd_tum").parse_args(argv)
    cfg = load_config(args.settings, **runner.config_overrides(args))
    sys_ = System(cfg, vocab=runner.load_vocab(args.vocabulary, cfg),
                  sensor=RGBD, use_loop_closing=not args.no_loop,
                  pipelined=args.pipelined)
    frames = datasets.load_tum_rgbd(args.sequence, args.associations)
    runner.run_sequence(sys_, frames, args,
                        lambda s, it: s.track_rgbd(it[1], it[2], it[0]))


if __name__ == "__main__":
    main()
