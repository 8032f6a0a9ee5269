from .graph_sim import ScanGraph, load_connectivity, make_synthetic_scan
