"""Minimal usage example — parity with the reference example.py:

create a uniform 10 mm/day condition, generate 10 hourly scenarios with the
pretrained generator, plot and save them.
"""

import numpy as np

from prdisagg_tpu.api import PretrainedGenerator

ndomain = 16  # the domain used in training; must match the weights

# load a trained generator:
#   PretrainedGenerator.from_npz("trained_models/wgancp_pixelnorm/gen_..._0020.npz")
# or the reference's Keras checkpoint:
#   PretrainedGenerator.from_keras_h5("trained_models/gen_..._0020.h5")
import glob
import sys

candidates = sorted(
    glob.glob("trained_models/*/gen_*_0*.npz")
    + glob.glob("trained_models/*/gen_*_0*.h5")   # default export format
    + glob.glob("trained_models/gen_*.h5")
)
if candidates:
    path = candidates[-1]
    print(f"loading {path}")
    gen = (PretrainedGenerator.from_keras_h5(path) if path.endswith(".h5")
           else PretrainedGenerator.from_npz(path))
else:
    print("no trained weights found — using a random-init generator "
          "(demonstrates the API; output is untrained)")
    from prdisagg_tpu.core.config import ModelConfig, TrainConfig
    from prdisagg_tpu.train import create_train_state

    state, _, _ = create_train_state(ModelConfig(), TrainConfig())
    gen = PretrainedGenerator(state.gen_params)

# made-up condition: 10 mm/day at every gridpoint (use your own data in mm)
cond1 = 10 * np.ones((ndomain, ndomain, 1))
n_scenarios = 10
scenarios1 = gen.generate_scenarios(cond1, n_scenarios)
fig = gen.plot_scenarios(scenarios1)
fig.savefig("generated_scenarios1.png")
print("saved generated_scenarios1.png;",
      "scenarios shape:", scenarios1.shape,
      "| conservation max error:",
      float(np.abs(scenarios1.sum(axis=1) - 10).max()))
