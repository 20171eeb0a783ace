from ku.initializers_ext.initializers import he_normal
