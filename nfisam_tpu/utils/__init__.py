from .keys import KeyStream, host_key, split_host
