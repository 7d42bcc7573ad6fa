"""Shim namespace root so ``google.protobuf`` resolves from the
BSD-licensed pure-Python protobuf runtime already present in this
container (google-cloud-sdk's bundled copy). No third-party code is
copied into this repository — the sibling ``protobuf`` package
extends its module search path to the existing installation."""
