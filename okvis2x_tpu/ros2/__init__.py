from okvis2x_tpu.ros2.transport import LocalTransport, Transport  # noqa: F401
from okvis2x_tpu.ros2.publisher import Publisher  # noqa: F401
from okvis2x_tpu.ros2.republisher import RePublisher  # noqa: F401
from okvis2x_tpu.ros2.subscriber import Subscriber  # noqa: F401
