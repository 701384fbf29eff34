"""TF1 checkpoint -> flax parameter conversion.

The reference warm-starts from (and publishes) TF1 checkpoints whose
variables live under the ``vgg16_netvlad_pca`` scope with matconvnet-
compatible names (reference model/nets.py:12, train/train.py:882-905). This
module maps those tensors onto the EmbeddingNet parameter pytree so converted
descriptors reproduce the reference to float tolerance (SURVEY.md §7 golden
test / parity protocol).

TensorFlow is NOT a dependency of this framework. Two input paths:

* an ``.npz`` of {tf_variable_name: array} — produce one on any machine with
  TF1/TF2 via::

      import tensorflow as tf, numpy as np
      r = tf.train.load_checkpoint(CKPT)
      np.savez(OUT, **{n: r.get_tensor(n)
                       for n in r.get_variable_to_shape_map()})

* a live TF checkpoint path, used only if ``tensorflow`` happens to be
  importable in the current environment.

Name mapping (TF -> flax):
  vgg16_netvlad_pca/average_rgb            -> vgg16/average_rgb
  vgg16_netvlad_pca/convX_Y/kernel|bias    -> vgg16/blockB/convX_Y/kernel|bias
  vgg16_netvlad_pca/assignment/kernel      -> netvlad/assignment/kernel
  vgg16_netvlad_pca/cluster_centers        -> netvlad/cluster_centers (squeezed
                                              from (1,1,1,D,K) to (D,K))
  fcN/dense*/kernel|bias                   -> fc_head/fcN/kernel|bias
Conv kernels keep TF's (kh, kw, in, out) layout — identical to flax.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

_SCOPE = "vgg16_netvlad_pca"
_BLOCK_OF_CONV = {1: "block1", 2: "block2", 3: "block3", 4: "block4", 5: "block5"}


def load_tf1_variables(path: str) -> Dict[str, np.ndarray]:
    """Load {name: array} from an .npz export or (if TF is importable) a raw
    TF checkpoint path."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    try:
        import tensorflow as tf  # optional, absent in the TPU image
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "tensorflow unavailable: export the checkpoint to .npz first "
            "(see models/convert_tf1.py docstring)"
        ) from e
    reader = tf.train.load_checkpoint(path)  # pragma: no cover
    return {  # pragma: no cover
        name: reader.get_tensor(name)
        for name in reader.get_variable_to_shape_map()
    }


def _strip(name: str) -> str:
    name = name.split(":")[0]
    prefix = _SCOPE + "/"
    return name[len(prefix):] if name.startswith(prefix) else name


def convert_tf1_variables(
    tf_vars: Mapping[str, np.ndarray],
) -> Tuple[Dict[str, Any], Dict[str, str]]:
    """Map TF1 variables into an EmbeddingNet params subtree.

    Returns (params, mapping) where mapping records tf_name -> flax path for
    auditability. Unrecognized variables (optimizer slots, global step) are
    skipped.
    """
    vgg: Dict[str, Any] = {}
    netvlad: Dict[str, Any] = {}
    fc: Dict[str, Any] = {}
    mapping: Dict[str, str] = {}

    conv_re = re.compile(r"^conv(\d)_(\d)/(kernel|bias)$")
    fc_re = re.compile(r"^fc(\d)(?:/dense(?:_\d+)?)?/(kernel|bias)$")

    for raw_name, value in tf_vars.items():
        name = _strip(raw_name)
        value = np.asarray(value)
        m = conv_re.match(name)
        if m:
            block = _BLOCK_OF_CONV[int(m.group(1))]
            conv = f"conv{m.group(1)}_{m.group(2)}"
            vgg.setdefault(block, {}).setdefault(conv, {})[m.group(3)] = value
            mapping[raw_name] = f"vgg16/{block}/{conv}/{m.group(3)}"
            continue
        if name == "average_rgb":
            vgg["average_rgb"] = value.reshape(3)
            mapping[raw_name] = "vgg16/average_rgb"
            continue
        if name == "assignment/kernel":
            netvlad.setdefault("assignment", {})["kernel"] = value
            mapping[raw_name] = "netvlad/assignment/kernel"
            continue
        if name == "cluster_centers":
            netvlad["cluster_centers"] = value.reshape(value.shape[-2], value.shape[-1])
            mapping[raw_name] = "netvlad/cluster_centers"
            continue
        m = fc_re.match(name)
        if m:
            layer = f"fc{m.group(1)}"
            fc.setdefault(layer, {})[m.group(2)] = value
            mapping[raw_name] = f"fc_head/{layer}/{m.group(2)}"
            continue
        # optimizer slots ('/Adam'), step counters etc. are intentionally skipped

    params: Dict[str, Any] = {}
    if vgg:
        params["vgg16"] = vgg
    if netvlad:
        params["netvlad"] = netvlad
    if fc:
        params["fc_head"] = fc
    return params, mapping


def convert_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, str]]:
    return convert_tf1_variables(load_tf1_variables(path))
