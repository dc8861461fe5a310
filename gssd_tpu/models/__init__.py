from gssd_tpu.models.ssd import SSD, build_model  # noqa: F401
