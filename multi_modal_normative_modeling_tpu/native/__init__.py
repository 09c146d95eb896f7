"""Native (C++) data-plane components, loaded via ctypes."""

from .fastcsv import FastCSV, fastcsv_available, read_feature_matrix  # noqa: F401
