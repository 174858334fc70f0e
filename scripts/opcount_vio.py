"""Count post-fusion HLO instructions of the shipped-scale VIO step."""
import collections
import re

import numpy as np
import jax
import jax.numpy as jnp

from fastlivo_tpu.config import load_config
from fastlivo_tpu.state import identity_state
from fastlivo_tpu.vio import Vio, vio_frame_step

cfg = load_config("/root/reference/config/avia.yaml",
                  "/root/reference/config/camera_pinhole.yaml")
v = Vio(cfg)
H, W = cfg.camera.height, cfg.camera.width
state = identity_state()
prior = identity_state()
gray = jnp.zeros((H, W), jnp.float32)
meta = jnp.asarray(np.array([v.cloud_cap // 2, 3], np.int32))
cloud = jnp.zeros((v.cloud_cap, 3), jnp.float32)

compiled = vio_frame_step.lower(
    v.vmap, v.cam, state, prior, gray, meta, cloud,
    v.Rci, v.Pci, v.Jdphi_dR, v.Jdp_dR,
    v._out_thre_dev, v._ncc_thre_dev, v._ipc_dev,
    grid_size=v.grid_size, patch_size=v.patch_size,
    gw=v.gw, gh=v.gh, ncc_en=cfg.ncc_en, max_iter=cfg.max_iteration,
    max_pg=v.max_pg, robust=cfg.capacity.vio_robust,
).compile()
txt = compiled.as_text()

counts = collections.OrderedDict()
ops = collections.defaultdict(collections.Counter)
comp = None
for line in txt.splitlines():
    h = re.match(r"(ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s*->.*\{\s*$", line)
    if h:
        comp = ("ENTRY " if h.group(1) else "") + h.group(2)
        counts[comp] = 0
        continue
    if comp is None:
        continue
    if line.strip() == "}":
        comp = None
        continue
    m = re.match(r"\s+(?:ROOT\s+)?%?[\w.\-]+\s*=\s*.*?\b([a-z][\w\-]*)\(",
                 line)
    if m:
        counts[comp] += 1
        ops[comp][m.group(1)] += 1

total = sum(counts.values())
streamed = {k: n for k, n in counts.items()
            if not k.split(" ")[-1].startswith(("fused_computation",
                                                "region", "compare",
                                                "scatter", "reduce",
                                                "minmax", "add", "mul",
                                                "and", "or"))}
print(f"computations: {len(counts)}  instructions(all): {total}")
print(f"non-fusion computations: {len(streamed)} "
      f"instr: {sum(streamed.values())}")
for name, n in sorted(streamed.items(), key=lambda kv: -kv[1])[:14]:
    tops = ", ".join(f"{k} x{c}" for k, c in ops[name].most_common(6))
    print(f"{n:6d}  {name[:58]:58s}  [{tops}]")
