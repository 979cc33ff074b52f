"""Annealing schedules (reference: /root/reference/utils.py:24-29)."""


def anneal(min_val, max_val, t, anneal_len):
    """Linear annealing from ``min_val`` to ``max_val`` over ``anneal_len``.

    Pure Python — used on the host to compute the per-batch KLD multiplier
    (/root/reference/trainer.py:227-229); the result is fed to the jitted
    train step as a scalar argument.
    """
    if t >= anneal_len:
        return max_val
    return (max_val - min_val) * t / anneal_len + min_val
