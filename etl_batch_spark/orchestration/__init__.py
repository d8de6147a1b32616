from etl_batch_spark.orchestration.clock import Clock, FakeClock  # noqa: F401
from etl_batch_spark.orchestration.daily000 import daily000  # noqa: F401
from etl_batch_spark.orchestration.envvar import EnvVarService  # noqa: F401
from etl_batch_spark.orchestration.loader import (  # noqa: F401
    get_loader_file_name,
    get_run_command,
)
from etl_batch_spark.orchestration.monitor import RunMonitor  # noqa: F401
from etl_batch_spark.orchestration.notify import MailMessage, Notifier  # noqa: F401
from etl_batch_spark.orchestration.runner import (  # noqa: F401
    BatchDisabled,
    BatchError,
    BatchRunner,
    DependencyFail,
    DuplicateRun,
    NoRecordBatchMaster,
    RunContext,
    TooManyRecordBatchMaster,
)
from etl_batch_spark.orchestration.store import ControlStore  # noqa: F401
from etl_batch_spark.orchestration.timers import Timer  # noqa: F401
