from jeicyboodsp_tpu.utils import cnum  # noqa: F401
