"""Loopback test of the SIBR live-viewer protocol: a fake viewer sends the
reference wire format and receives rendered bytes from the training poll
(reference network_gui.py:26-85 + train_gaussians.py:79-92)."""
import json
import math
import socket
import struct

import numpy as np
import jax.numpy as jnp

from gaussianhaircut_tpu.config import ModelConfig
from gaussianhaircut_tpu.models import gaussian_model as gm
from gaussianhaircut_tpu.ops.rasterize import RasterConfig
from gaussianhaircut_tpu.render import network_gui
from gaussianhaircut_tpu.train import stage1


def _viewer_message(width, height, world_view, full_proj, fov,
                    do_training=1, keep_alive=0, scaling=1.0):
    extra = json.dumps({"fov_x": fov, "fov_y": fov}).encode()
    body = struct.pack("II", width, height)
    body += struct.pack("bbbb", do_training, 0, 0, keep_alive)
    body += struct.pack("f", scaling)
    body += np.asarray(world_view, np.float32).tobytes()
    body += np.asarray(full_proj, np.float32).tobytes()
    body += struct.pack("I", len(extra)) + extra
    return struct.pack("I", len(body)) + body


def test_gui_roundtrip(tmp_path):
    res = 32
    rng = np.random.default_rng(0)
    pts = rng.normal(scale=0.3, size=(64, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, (64, 3)).astype(np.float32)
    model = gm.create_from_pcd(pts, cols, 64, 0, 1.0)
    state = stage1.init_train_state(model, 1, use_barf=True)

    w2c = np.eye(4, dtype=np.float32)
    w2c[2, 3] = 2.0
    viewmatrix = w2c.T
    fov = 0.8
    f = 1.0 / math.tan(fov / 2)
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = f
    proj[1, 1] = f
    proj[2, 2] = 1.0001
    proj[2, 3] = 1.0
    proj[3, 2] = -0.01
    full_proj = viewmatrix @ proj.T

    network_gui.init("127.0.0.1", 0)           # ephemeral port
    try:
        port = network_gui.listener.getsockname()[1]
        client = socket.create_connection(("127.0.0.1", port))
        client.sendall(_viewer_message(res, res, viewmatrix, full_proj, fov))

        cfg = ModelConfig()
        cfg.source_path = str(tmp_path)
        cfg.white_background = False
        raster_cfg = RasterConfig(tile_w=16, tile_h=16, chunk=32,
                                  capacity_mult=32, backend="jnp")
        stage1.poll_gui(state, cfg, raster_cfg, active_sh_degree=0,
                        iteration=1, total_iters=10)

        payload = b""
        want = res * res * 3
        while len(payload) < want:
            payload += client.recv(want - len(payload))
        img = np.frombuffer(payload, np.uint8).reshape(res, res, 3)
        assert img.shape == (res, res, 3)
        n = struct.unpack("I", client.recv(4))[0]
        assert client.recv(n).decode() == str(tmp_path)
        client.close()
    finally:
        network_gui.listener.close()
        network_gui.listener = None
        network_gui.conn = None
