"""CLI dataset drivers mirroring the reference's seven example binaries
(/root/reference/CMakeLists.txt:125-155): mono_tum, mono_kitti,
mono_euroc, mono_euroc_vins, rgbd_tum, stereo_kitti, stereo_euroc —
same argv contract (vocabulary, settings, sequence), same trajectory
outputs, same per-frame timing statistics."""
