"""multimodal_organ_segmentation_tpu — TPU-native multi-modal 3D organ segmentation.

A brand-new JAX/XLA/Pallas framework with the capabilities of the PyTorch
reference `wittyseok/multimodal-organ-segmentation` (see SURVEY.md), designed
TPU-first:

- models (UNet3D / SwinUNETR / DualEncoder + fusion library) are flax.linen
  modules in channels-last NDHWC layout so XLA tiles convolutions straight
  onto the MXU;
- training is a pure functional ``train_step(state, batch) -> (state, metrics)``
  under ``jit``/``pjit`` with ``lax.scan`` gradient accumulation and a bf16
  compute policy (no GradScaler needed on TPU);
- sliding-window inference compiles to a single XLA program with a
  precomputed Gaussian importance map;
- parallelism is expressed with ``jax.sharding.Mesh`` + NamedSharding; XLA
  inserts the collectives (psum/all-gather) over ICI/DCN;
- the hot attention paths (3D windowed attention, cross-modal voxel
  attention) have Pallas TPU kernels with pure-XLA fallbacks for CPU tests.

Reference parity map: see SURVEY.md §2 (component inventory).
"""

__version__ = "0.1.0"
