"""Attribute-style dictionary used for configurations.

Replaces the `easydict.EasyDict` dependency of the reference
(/root/reference/libs/general/configuration.py:11) with a small local
implementation so configs support `cfg.e_tracker.ransac.repeat` access.
"""


class AttrDict(dict):
    """A dict whose items are also accessible as attributes, recursively."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        if d is None:
            d = {}
        d = dict(d)
        d.update(kwargs)
        for k, v in d.items():
            self[k] = v

    @classmethod
    def _convert(cls, value):
        if isinstance(value, dict) and not isinstance(value, AttrDict):
            return cls(value)
        if isinstance(value, (list, tuple)):
            return type(value)(cls._convert(v) for v in value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, self._convert(value))

    def __setattr__(self, key, value):
        self[key] = value

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __delattr__(self, key):
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def to_dict(self):
        """Convert back to plain nested dicts (for YAML dumping)."""
        out = {}
        for k, v in self.items():
            if isinstance(v, AttrDict):
                out[k] = v.to_dict()
            elif isinstance(v, (list, tuple)):
                out[k] = type(v)(
                    x.to_dict() if isinstance(x, AttrDict) else x for x in v
                )
            else:
                out[k] = v
        return out

    def copy(self):
        return AttrDict(self.to_dict())
