from nestmc.io.loaders import load_csv

__all__ = ["load_csv"]
