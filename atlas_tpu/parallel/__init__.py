from atlas_tpu.parallel.mesh import get_mesh, make_mesh, mesh_shape
