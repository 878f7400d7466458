from .attrdict import AttrDict
from .configuration import ConfigLoader, read_yaml
from .timer import Timer
