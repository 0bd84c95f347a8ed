from hairfastgan_tpu.eval.fid import FIDStats, frechet_distance, fid_from_features  # noqa: F401
