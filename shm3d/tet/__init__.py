from .mesher import TetMesh, build_tet_domain
