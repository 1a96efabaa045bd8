"""Pure numpy/python kernels — no Spark imports here."""
