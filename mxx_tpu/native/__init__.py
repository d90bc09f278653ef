from .codec import pack_u32, packed_size, unpack_u32, native_available  # noqa: F401
