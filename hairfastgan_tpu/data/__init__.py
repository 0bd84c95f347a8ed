from hairfastgan_tpu.data.native_loader import NativeImageLoader, load_image_native  # noqa: F401
