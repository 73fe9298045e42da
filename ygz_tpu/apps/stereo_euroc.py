"""Stereo EuRoC driver (reference Examples/Stereo/stereo_euroc.cc).
The reference pre-rectifies with cv::initUndistortRectifyMap from the
LEFT./RIGHT. K,D,R,P settings blocks; here rectification maps are built
from the same YAML keys and applied with the device remap kernel."""

import numpy as np

from ygz_tpu.apps import runner
from ygz_tpu.pipeline.system import System, STEREO
from ygz_tpu.utils import datasets
from ygz_tpu.utils.config import load_config, _parse_opencv_yaml


def main(argv=None):
    args = runner.make_parser("stereo_euroc").parse_args(argv)
    cfg = load_config(args.settings, **runner.config_overrides(args))
    sys_ = System(cfg, vocab=runner.load_vocab(args.vocabulary, cfg),
                  sensor=STEREO, use_loop_closing=not args.no_loop,
                  pipelined=args.pipelined)

    # optional rectification from LEFT./RIGHT. blocks
    y = _parse_opencv_yaml(args.settings)
    rectify = all(f"LEFT.{k}" in y for k in ("K", "D", "R", "P"))
    maps = None
    if rectify:
        from ygz_tpu.utils.rectify import stereo_rectify_maps
        maps = stereo_rectify_maps(y, cfg.camera.width, cfg.camera.height)

    def track(s, it):
        t, l, r = it
        if maps is not None:
            from ygz_tpu.ops.interp import remap
            import jax.numpy as jnp
            l = np.asarray(remap(jnp.asarray(l), maps[0]))
            r = np.asarray(remap(jnp.asarray(r), maps[1]))
        s.track_stereo(l, r, t)

    frames = datasets.load_euroc_stereo(args.sequence)
    runner.run_sequence(sys_, frames, args, track)


if __name__ == "__main__":
    main()
