"""User-style smoke: config → loss on synthetic volume → metrics → NIfTI IO."""
import numpy as np, jax.numpy as jnp
from multimodal_organ_segmentation_tpu.utils import (
    default_config, load_config, save_config, set_seed, KeyStream,
    load_nifti, save_nifti, setup_logger)
from multimodal_organ_segmentation_tpu.train import get_loss, get_metrics

log = setup_logger("smoke", "/tmp/smoke.log")
cfg = default_config()
log.info(f"model={cfg.model.name} loss={cfg.training.loss.name} roi={cfg.inference.sliding_window.roi_size}")

key = set_seed(cfg.experiment.seed)
ks = KeyStream(key)

# fake logits/labels like a real batch: [B,H,W,D,C] / [B,H,W,D]
rng = np.random.default_rng(0)
logits = jnp.asarray(rng.normal(size=(2, 16, 16, 16, 8)).astype(np.float32))
labels = jnp.asarray(rng.integers(0, 8, size=(2, 16, 16, 16)))

loss_fn = get_loss(cfg)
loss = float(loss_fn(logits, labels))
log.info(f"dice_ce loss on random logits = {loss:.4f}")
assert 0 < loss < 20

metrics = get_metrics(cfg)
pred = np.asarray(jnp.argmax(logits, -1))
metrics["dice"].update(pred, np.asarray(labels))
metrics["confusion"].update(pred, np.asarray(labels))
d = metrics["dice"].compute(); c = metrics["confusion"].compute()
log.info(f"dice={d['dice']:.4f} acc={c['accuracy']:.4f}")

# NIfTI roundtrip with non-identity affine
vol = rng.normal(size=(24, 20, 16)).astype(np.float32)
aff = np.array([[1.5,0,0,-10],[0,1.5,0,5],[0,0,2.0,0],[0,0,0,1]])
save_nifti(vol, "/tmp/smoke_vol.nii.gz", affine=aff)
back, aff2 = load_nifti("/tmp/smoke_vol.nii.gz", return_affine=True)
assert np.allclose(back, vol, atol=1e-6) and np.allclose(aff, aff2)
log.info("nifti roundtrip OK")

# config save/load roundtrip
cfg.set("training.epochs", 5)
save_config(cfg, "/tmp/smoke_cfg.yaml")
cfg2 = load_config("/tmp/smoke_cfg.yaml")
assert cfg2.training.epochs == 5
print("SMOKE_OK loss=%.4f dice=%.4f" % (loss, d["dice"]))
