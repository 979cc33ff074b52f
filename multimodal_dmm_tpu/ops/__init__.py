"""Pure-math core ops: Gaussian expert fusion, masked losses, schedules."""

from .poe import (product_of_experts, product_of_experts_pair,
                  mean_of_experts)
from .losses import (kld_gauss, nll_bernoulli, nll_bernoulli_logits,
                     bce_logits_masked_sum, nll_categorical, nll_gauss)
from .schedules import anneal
