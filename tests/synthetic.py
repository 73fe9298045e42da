"""Shared synthetic scene renderer for end-to-end tests: a camera moving
in front of a large textured plane (flat world — exercises the H-model
initializer, tracking, BA, and keyframing without needing a rasterizer)."""

import numpy as np
import jax.numpy as jnp

from ygz_tpu.core import lie
from ygz_tpu.core.camera import Camera
from ygz_tpu.ops.interp import bilinear_sample

CAM = Camera(fx=120.0, fy=120.0, cx=64.0, cy=48.0, width=128, height=96)
PLANE_Z = 3.0
TEX_SCALE = 60.0  # texels per world unit


def make_texture(seed=0, size=(640, 900)):
    """High-contrast mosaic texture: thresholded multi-scale noise gives
    sharp, well-localized corners (sub-pixel repeatable under viewpoint
    change), lightly smoothed for stable interpolation."""
    rng = np.random.RandomState(seed)
    from scipy.ndimage import gaussian_filter
    tex = np.zeros(size, np.float32)
    for sigma, amp in ((2.0, 1.0), (5.0, 1.0), (10.0, 0.7)):
        n = gaussian_filter(rng.rand(*size).astype(np.float32) - 0.5, sigma)
        tex += amp * np.sign(n) * (np.abs(n) > np.percentile(np.abs(n), 30))
    tex = gaussian_filter(tex, 0.8)
    tex = tex - tex.min()
    return (tex / max(tex.max(), 1e-6) * 255.0).astype(np.float32)


def make_landmark_texture(seed=0, size=(640, 900), n_marks=160):
    """Texture with DISTINCT sparse landmarks over a muted noise base.

    The plain `make_texture` noise mosaic is procedurally self-similar —
    every region yields statistically identical descriptors, so BoW
    place recognition is perceptually aliased by construction and loop
    detection cannot work no matter the vocabulary. Here each landmark
    is a unique random high-frequency stamp, so different plane regions
    produce genuinely different visual words (what real scenes give a
    place recognizer)."""
    rng = np.random.RandomState(seed)
    from scipy.ndimage import gaussian_filter
    # corner-rich but contrast-compressed mosaic base: enough texture for
    # the tracker between landmarks, while the full-contrast stamps
    # dominate the BoW signature of each region
    base = make_texture(seed, size) * 0.45 + 60.0
    tex = base
    H, W = size
    for _ in range(n_marks):
        s = rng.randint(10, 28)             # stamp half-size in texels
        cy = rng.randint(s, H - s)
        cx = rng.randint(s, W - s)
        stamp = (rng.rand(8, 8) > 0.5).astype(np.float32)
        stamp = np.kron(stamp, np.ones((2 * s // 8 + 1, 2 * s // 8 + 1),
                                       np.float32))[:2 * s, :2 * s]
        lo, hi = rng.uniform(0, 60), rng.uniform(180, 255)
        tex[cy - s:cy + s, cx - s:cx + s] = lo + (hi - lo) * stamp
    return gaussian_filter(tex, 0.6).astype(np.float32)


def circuit_trajectory(n_frames: int, width: float = 1.6,
                       height: float = 1.0, dt: float = 0.1,
                       overlap: float = 0.25, smooth: int = 15):
    """Rectangular circuit over the plane returning to (and re-tracing)
    the start — a genuine loop for loop-closure tests. The final
    `overlap` fraction of a side re-traverses the first leg. Corners are
    rounded by a `smooth`-frame box filter: a hard 90-degree turn is a
    velocity step that breaks any constant-velocity motion model (and
    real rigs bank through turns)."""
    per = 2.0 * (width + height) + overlap * width
    xs, ys = [], []
    for i in range(n_frames):
        d = per * i / max(n_frames - 1, 1)
        if d < width:
            x, y = d, 0.0
        elif d < width + height:
            x, y = width, d - width
        elif d < 2 * width + height:
            x, y = width - (d - width - height), height
        elif d < 2 * width + 2 * height:
            x, y = 0.0, height - (d - 2 * width - height)
        else:
            x, y = d - 2 * (width + height), 0.0
        xs.append(x - width / 2.0)
        ys.append(y - height / 2.0)
    if smooth > 1:
        k = np.ones(smooth) / smooth
        pad = smooth // 2
        xs = np.convolve(np.pad(xs, pad, mode="edge"), k, "valid")
        ys = np.convolve(np.pad(ys, pad, mode="edge"), k, "valid")
    out = []
    for i in range(n_frames):
        xi = jnp.asarray(np.array([xs[i], ys[i], 0.0, 0.0, 0.0, 0.0],
                                  np.float32))
        T_wc = lie.se3_exp(xi)
        out.append((i * dt, lie.se3_inverse(T_wc)))
    return out


def multi_lap_trajectory(n_frames: int, laps: float = 2.0,
                         width: float = 6.0, height: float = 4.0,
                         dt: float = 0.1, smooth: int = 15):
    """`laps` times around the rectangular circuit — the long-sequence
    analogue of circuit_trajectory (KITTI-scale runs re-traverse the
    same streets many times)."""
    per = 2.0 * (width + height)
    xs, ys = [], []
    for i in range(n_frames):
        d = (per * laps * i / max(n_frames - 1, 1)) % per
        if d < width:
            x, y = d, 0.0
        elif d < width + height:
            x, y = width, d - width
        elif d < 2 * width + height:
            x, y = width - (d - width - height), height
        else:
            x, y = 0.0, height - (d - 2 * width - height)
        xs.append(x - width / 2.0)
        ys.append(y - height / 2.0)
    if smooth > 1:
        k = np.ones(smooth) / smooth
        pad = smooth // 2
        xs = np.convolve(np.pad(xs, pad, mode="edge"), k, "valid")
        ys = np.convolve(np.pad(ys, pad, mode="edge"), k, "valid")
    out = []
    for i in range(n_frames):
        xi = jnp.asarray(np.array([xs[i], ys[i], 0.0, 0.0, 0.0, 0.0],
                                  np.float32))
        T_wc = lie.se3_exp(xi)
        out.append((i * dt, lie.se3_inverse(T_wc)))
    return out


_FG_CACHE = {}


def _fg_layer(seed, landmarks=False):
    """Foreground occupancy + texture for the near plane: blobby solid
    patches covering ~40% of the area."""
    key = (seed, landmarks)
    if key not in _FG_CACHE:
        rng = np.random.RandomState(seed + 1000)
        from scipy.ndimage import gaussian_filter
        occ = gaussian_filter(rng.rand(640, 900).astype(np.float32), 18.0)
        occ = (occ > np.percentile(occ, 60)).astype(np.float32)
        occ = gaussian_filter(occ, 1.0)
        tex = make_landmark_texture(seed + 2000) if landmarks \
            else make_texture(seed + 2000)
        _FG_CACHE[key] = (occ, tex)
    return _FG_CACHE[key]


def _plane_hit(tex, T_wc_origin, dirs, plane_z, tex_shape):
    tt = (plane_z - T_wc_origin[2]) / dirs[:, 2]
    pw = T_wc_origin[None, :] + tt[:, None] * dirs
    texel = jnp.stack([pw[:, 0] * TEX_SCALE + tex_shape[1] / 2,
                       pw[:, 1] * TEX_SCALE + tex_shape[0] / 2], -1)
    return texel, tt


def _pixel_rays(cam: Camera):
    """Unit-z camera rays per pixel. A calibration with distortion models a
    real distorting lens: the ray behind pixel u is the IDEAL direction
    whose distorted projection lands on u, i.e. undistort((u-c)/f) — so
    rendered images carry true lens distortion and exercise the pipeline's
    undistortion remap."""
    H, W = cam.height, cam.width
    us, vs = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    xn = jnp.asarray(np.stack([(us - cam.cx) / cam.fx,
                               (vs - cam.cy) / cam.fy], -1))
    if cam.has_distortion:
        from ygz_tpu.core.camera import undistort_normalized
        xn = undistort_normalized(cam, xn)
    return jnp.concatenate([xn, jnp.ones(xn.shape[:-1] + (1,))],
                           -1).reshape(-1, 3)


def render_with_depth(tex, T_cw, cam: Camera = CAM, plane_z: float = PLANE_Z,
                      seed: int = 0, fg_landmarks: bool = False):
    """Like render(three_d=True) but also returns the depth map (camera-z)."""
    H, W = cam.height, cam.width
    rays = _pixel_rays(cam)
    T_wc = lie.se3_inverse(T_cw)
    origin = T_wc["t"]
    dirs = lie.quat_rotate(T_wc["q"], rays)

    texel_bg, tt_bg = _plane_hit(tex, origin, dirs, plane_z, tex.shape)
    img = bilinear_sample(jnp.asarray(tex), texel_bg)
    depth = tt_bg  # rays have unit camera-z, so t == camera depth
    occ, fg_tex = _fg_layer(seed, landmarks=fg_landmarks)
    texel_fg, tt_fg = _plane_hit(fg_tex, origin, dirs, plane_z * 2.0 / 3.0,
                                 fg_tex.shape)
    fg_val = bilinear_sample(jnp.asarray(fg_tex), texel_fg)
    fg_occ = bilinear_sample(jnp.asarray(occ), texel_fg)
    hit = (fg_occ > 0.5) & (tt_fg > 0)
    img = jnp.where(hit, fg_val, img)
    depth = jnp.where(hit, tt_fg, depth)
    return (np.asarray(img.reshape(H, W)),
            np.asarray(depth.reshape(H, W)))


def render_stereo(tex, T_cw_left, baseline: float, cam: Camera = CAM,
                  seed: int = 0):
    """Rectified stereo pair: the right camera is offset +baseline along
    the left camera's x axis."""
    T_rl = lie.se3(lie.quat_identity(),
                   jnp.asarray(np.array([-baseline, 0, 0], np.float32)))
    T_cw_right = lie.se3_compose(T_rl, T_cw_left)
    left = render(tex, T_cw_left, cam=cam, seed=seed)
    right = render(tex, T_cw_right, cam=cam, seed=seed)
    return left, right


def render(tex, T_cw, cam: Camera = CAM, plane_z: float = PLANE_Z,
           seed: int = 0, three_d: bool = True, fg_landmarks: bool = False):
    """Render the synthetic world: a textured background plane at
    `plane_z` plus (three_d) a partially-occupied foreground plane at
    2/3 of that depth — a pure plane is degenerate for monocular SfM
    (global flex modes stay observation-consistent), so e2e tests need
    real depth structure."""
    H, W = cam.height, cam.width
    rays = _pixel_rays(cam)
    T_wc = lie.se3_inverse(T_cw)
    origin = T_wc["t"]
    dirs = lie.quat_rotate(T_wc["q"], rays)

    texel_bg, _ = _plane_hit(tex, origin, dirs, plane_z, tex.shape)
    img = bilinear_sample(jnp.asarray(tex), texel_bg)
    if three_d:
        occ, fg_tex = _fg_layer(seed, landmarks=fg_landmarks)
        texel_fg, tt = _plane_hit(fg_tex, origin, dirs, plane_z * 2.0 / 3.0,
                                  fg_tex.shape)
        fg_val = bilinear_sample(jnp.asarray(fg_tex), texel_fg)
        fg_occ = bilinear_sample(jnp.asarray(occ), texel_fg)
        hit = (fg_occ > 0.5) & (tt > 0)
        img = jnp.where(hit, fg_val, img)
    return np.asarray(img.reshape(H, W))


def orbit_trajectory(n_frames: int, dt: float = 0.1):
    """Slow lateral sweep with gentle rotation, always facing the plane.
    Returns [(timestamp, T_cw dict)]."""
    out = []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        x = 0.8 * np.sin(2 * np.pi * s * 0.5)
        y = 0.25 * np.sin(2 * np.pi * s)
        z = 0.15 * np.sin(2 * np.pi * s * 0.7)
        yaw = 0.08 * np.sin(2 * np.pi * s)
        pitch = 0.05 * np.sin(2 * np.pi * s * 1.3)
        xi = jnp.asarray(
            np.array([x, y, z, pitch, yaw, 0.0], np.float32))
        T_wc = lie.se3_exp(xi)       # camera pose in world
        T_cw = lie.se3_inverse(T_wc)
        out.append((i * dt, T_cw))
    return out
