from macsa_tpu.data.text_preprocess import TextNormalize, convert_unicode  # noqa: F401
