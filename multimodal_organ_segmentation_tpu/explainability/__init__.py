"""Explainability: GradCAM/GradCAM++, attention maps, t-SNE, gradient SHAP.

Reference parity: src/explainability/ (SURVEY.md §2.7), redesigned for JAX
(no module hooks):

- activations come from the models' ``capture`` API;
- gradients w.r.t. activations come from flax ``perturb`` variables
  (``jax.grad(score)(perturbations)`` ≡ torch backward hooks);
- attention probabilities are ``sow``-n into the ``intermediates``
  collection.

Unlike the reference — which wires explainability flags into config but
never invokes the visualizers (SURVEY.md §1) — ``run_explainability`` is a
first-class CLI mode (``--mode explain``).
"""

from multimodal_organ_segmentation_tpu.explainability.gradcam import (  # noqa: F401
    GradCAM,
    GradCAMPlusPlus,
    visualize_gradcam,
)
from multimodal_organ_segmentation_tpu.explainability.attention import (  # noqa: F401
    AttentionVisualizer,
)
from multimodal_organ_segmentation_tpu.explainability.tsne import (  # noqa: F401
    TSNEVisualizer,
)
from multimodal_organ_segmentation_tpu.explainability.shap_analysis import (  # noqa: F401
    SHAPAnalyzer,
)
from multimodal_organ_segmentation_tpu.explainability.runner import (  # noqa: F401
    run_explainability,
)
