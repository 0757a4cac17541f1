from pstl_tpu.data.synthetic import generate_dataset, generate_scene  # noqa: F401
from pstl_tpu.data.dataset import SceneDataset, batch_iterator  # noqa: F401
