from .srs import SRS, setup
from .ipa import commit, open_poly, verify_open

__all__ = ["SRS", "setup", "commit", "open_poly", "verify_open"]
