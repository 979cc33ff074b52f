"""Spirals semi-supervised: whole-modality (spiral-y) deletion grid.

Mirrors /root/reference/experiments/spirals_semisup.py.
"""

from ..apps.spirals import SpiralsTrainer
from ._partial_semisup import make_parser, run_grid, analyze_best3

parser = make_parser("spirals_semisup")


def run(args):
    levels = (args.levels if args.levels is not None
              else [i / 10 for i in range(10)])
    run_grid(args, SpiralsTrainer, "spirals_tune",
             base_config={"lr": 5e-3},
             corrupt_grid=[{'semi': f, 'modalities': ['spiral-y']}
                           for f in levels])


def analyze(args):
    return analyze_best3(args, 'config:corrupt:semi',
                         ['mse', 'rec_loss'])


if __name__ == "__main__":
    args = parser.parse_args()
    if not args.analyze:
        run(args)
    analyze(args)
