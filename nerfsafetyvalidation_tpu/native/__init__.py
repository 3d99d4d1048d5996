"""Native C++ host runtime (A*, EDT, morton) with ctypes bindings."""
