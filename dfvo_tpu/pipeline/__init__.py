from .dfvo import DFVO
