"""Profile SlamAgent per-frame stages on the real chip."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from dvm_slam_tpu.frontend.extractor import FrontendConfig
from dvm_slam_tpu.tracking import tracker as trk
from dvm_slam_tpu.mapping import local_mapping
from dvm_slam_tpu.io import synthetic
from dvm_slam_tpu.multiagent import transport as mtransport
from dvm_slam_tpu.multiagent.agent import SlamAgent
from dvm_slam_tpu.placerec import vocabulary

H, W = 480, 752
K = np.array([458.654, 457.296, 367.215, 248.375], np.float32)
fc = FrontendConfig(height=H, width=W, n_features=1250)
cfg = trk.TrackerConfig(frontend=fc, kf_cap=128, pt_cap=8192, fps=20.0)
world = synthetic.PlaneWorld(seed=7, tex_size=2048, plane_z=6.0, extent=36.0)
Kj = jnp.asarray(K)

rngv = np.random.RandomState(0)
voc = vocabulary.train((rngv.rand(4000, 256) > 0.5).astype(np.uint8),
                       branch=8, depth=3, seed=0)
ag = SlamAgent(1, cfg, K, np.zeros(4, np.float32), voc,
               mtransport.LoopbackTransport(), [1],
               mapper=local_mapping.LocalMapper(
                   n_neighbors=5, ba_local=12, ba_fixed=8,
                   ba_pts=4096, ba_iters=6))

poses = synthetic.smooth_trajectory(180, lateral=2.5, forward=0.8, yaw=0.1)
imgs = [np.asarray(world.render(jnp.asarray(p), Kj, H, W)) for p in poses[:60]]
e2e_imgs = [np.clip(np.asarray(world.render(jnp.asarray(p), Kj, H, W)),
                    0, 255).astype(np.uint8) for p in poses[60:]]

for i, img in enumerate(imgs):
    ag.process_image(img, i * 0.05)
for w in range(4):
    ag.process_image(e2e_imgs[w], (60 + w) * 0.05)
ag.flush()

# instrument: wrap stages
import dvm_slam_tpu.multiagent.agent as agmod
stage_t = {}


def timed(name, fn):
    def wrap(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        stage_t[name] = stage_t.get(name, 0.0) + time.perf_counter() - t0
        return r
    return wrap


ag._update_bow_db = timed("bow_db", ag._update_bow_db)
ag._drain_channels = timed("drain", ag._drain_channels)
ag._send_new_key_frame_bows = timed("send_bows", ag._send_new_key_frame_bows)
ag._send_new_key_frames = timed("send_kfs", ag._send_new_key_frames)
ag._poll_gba = timed("poll_gba", ag._poll_gba)
ag._update_is_lost = timed("is_lost", ag._update_is_lost)
ag._update_map_scale = timed("map_scale", ag._update_map_scale)
tr = ag.tracker
orig_tpi = tr.process_image
tr.process_image = timed("tracker", orig_tpi)

n = len(e2e_imgs) - 4
t0 = time.perf_counter()
for i, img in enumerate(e2e_imgs[4:]):
    ag.process_image(img, (64 + i) * 0.05)
t_loop = time.perf_counter() - t0
t0 = time.perf_counter()
ag.flush()
t_flush = time.perf_counter() - t0
print(f"frames={n} loop={t_loop:.2f}s flush={t_flush:.2f}s "
      f"fps_loop={n / t_loop:.2f} fps_incl_flush={n / (t_loop + t_flush):.2f}")
for k_, v in sorted(stage_t.items(), key=lambda kv: -kv[1]):
    print(f"  {k_:12s} {v * 1000 / n:8.2f} ms/frame  total {v:.2f}s")
