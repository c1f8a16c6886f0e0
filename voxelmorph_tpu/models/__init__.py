"""Model zoo: registration networks and checkpoint IO."""

from . import atlas, hyper, modelio, synthmorph, unet, vxm
from .atlas import (ConditionalTemplateCreation, MeanStream,
                    ProbAtlasSegmentation, TemplateCreation)
from .hyper import HyperVxmDense
from .synthmorph import (HyperVxmJoint, LabelsToImageConfig, SynthMorphDense,
                         VxmAffineFeatureDetector, labels_to_image)
from .modelio import (load_model, register_config, register_model, save_model)
from .unet import Unet
from .vxm import (InstanceDense, Transform, VxmDense,
                  VxmDenseSemiSupervisedPointCloud, VxmDenseSemiSupervisedSeg)

for _cls in (VxmDense, VxmDenseSemiSupervisedSeg, VxmDenseSemiSupervisedPointCloud,
             InstanceDense, Unet, TemplateCreation, ConditionalTemplateCreation,
             ProbAtlasSegmentation, HyperVxmDense, VxmAffineFeatureDetector,
             HyperVxmJoint, SynthMorphDense):
    register_model(_cls)
register_config(LabelsToImageConfig)
