"""Model registry (reference: /root/reference/models/__init__.py)."""

from .dmm import MultiDMM

# Short-name map used by the trainer's dispatch (trainer.py:193-199).
names = {"dmm": "MultiDMM", "dks": "MultiDKS", "vrnn": "MultiVRNN"}


def get_model(name):
    """Resolve a short or long model name to its class."""
    from . import dmm as _dmm
    mods = [_dmm]
    try:
        from . import dks as _dks
        mods.append(_dks)
    except ImportError:
        pass
    try:
        from . import vrnn as _vrnn
        mods.append(_vrnn)
    except ImportError:
        pass
    long_name = names.get(name, name)
    for mod in mods:
        if hasattr(mod, long_name):
            return getattr(mod, long_name)
    raise ValueError("Model name not recognized: " + name)
