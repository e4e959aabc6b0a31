"""RU factory: one entry point selecting the RU implementation.

Counterpart of the reference's per-flavor factories
(lib/ru/dummy/ru_dummy_factory.cpp, lib/ru/generic/ru_factory_generic_impl.cpp,
lib/ru/ofh) behind apps' ``ru_cfg.type`` switch.
"""

from __future__ import annotations

from .dummy import RuDummy, RuDummyConfig
from .generic import RuGeneric, RuGenericConfig
from .ofh_ru import RuOfh, RuOfhConfig, RuOfhMultiSector


def create_ru(kind: str, config, symbol_notifier, **kwargs):
    """kind in {"dummy", "generic", "ofh"}; config must match the kind."""
    if kind == "dummy":
        assert isinstance(config, RuDummyConfig)
        return RuDummy(config, symbol_notifier, **kwargs)
    if kind == "generic":
        assert isinstance(config, RuGenericConfig)
        return RuGeneric(config, symbol_notifier, **kwargs)
    if kind == "ofh":
        # A list/tuple of sector configs selects the multi-sector RU
        # (reference ru_ofh_impl's sector vector).
        if isinstance(config, (list, tuple)):
            assert all(isinstance(c, RuOfhConfig) for c in config)
            return RuOfhMultiSector(list(config), symbol_notifier, **kwargs)
        assert isinstance(config, RuOfhConfig)
        return RuOfh(config, symbol_notifier, **kwargs)
    raise ValueError(f"unknown RU kind: {kind!r}")
