"""zotpu: a TPU-native k-mer workbench (capabilities of drtconway/zotmer)."""

__version__ = "0.1.0"
