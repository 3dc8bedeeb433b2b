from nebulae_tpu.nrc.cache import NRCConfig, init_cache, query_cache, train_cache_step  # noqa: F401
