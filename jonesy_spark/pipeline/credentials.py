"""S3A credential configuration for the extract sinks (S7).

The reference obtains uploads credentials either from an assumed STS
role or from static keys (``jonesy/jobs.py:76-97``: ``get_session``
branches on ``AWS_ROLE_ARN``; ``get_sts_credentials`` assumes the role
for 3600 s under the session name ``AssumeAppRoleSession``). On Spark
the equivalent is declarative: hand Hadoop's S3A connector the same
inputs via ``fs.s3a.*`` configuration and let its
``AssumedRoleCredentialProvider`` mint and refresh the STS session on
every executor — no driver-held tokens to expire mid-job, which is the
100 TB-safe shape (the reference's single 3600 s token would die under
any long extract).

Server-side encryption rides along (SSE-AES256, the reference's upload
``ServerSideEncryption='AES256'`` argument at ``jonesy/jobs.py:128``).
"""

from __future__ import annotations

from collections.abc import Mapping

#: Hadoop S3A provider that assumes a role and auto-refreshes STS creds.
ASSUMED_ROLE_PROVIDER = "org.apache.hadoop.fs.s3a.auth.AssumedRoleCredentialProvider"
#: Static-key provider used directly, or as the inner provider that
#: authenticates the AssumeRole call itself.
SIMPLE_PROVIDER = "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider"


def s3a_credentials_conf(env: Mapping[str, str]) -> dict[str, str]:
    """Build the ``fs.s3a.*`` conf dict from the reference's config keys.

    Mirrors ``jonesy/jobs.py:76-97``: with ``AWS_ROLE_ARN`` set, assume
    the role (3600 s sessions, same session name); otherwise use the
    static key pair. Apply with ``spark.conf.set`` per entry, or as
    ``--conf spark.hadoop.<key>=<value>`` at submit time.
    """
    conf = {"fs.s3a.server-side-encryption-algorithm": "AES256"}
    role_arn = env.get("AWS_ROLE_ARN") or ""
    access_key = env.get("AWS_ACCESS_KEY_ID") or ""
    secret_key = env.get("AWS_SECRET_ACCESS_KEY") or ""
    if role_arn:
        conf.update(
            {
                "fs.s3a.aws.credentials.provider": ASSUMED_ROLE_PROVIDER,
                "fs.s3a.assumed.role.arn": role_arn,
                "fs.s3a.assumed.role.session.name": "AssumeAppRoleSession",
                "fs.s3a.assumed.role.session.duration": "3600s",
                "fs.s3a.assumed.role.credentials.provider": SIMPLE_PROVIDER,
            }
        )
        if access_key:
            conf["fs.s3a.access.key"] = access_key
            conf["fs.s3a.secret.key"] = secret_key
    else:
        conf.update(
            {
                "fs.s3a.aws.credentials.provider": SIMPLE_PROVIDER,
                "fs.s3a.access.key": access_key,
                "fs.s3a.secret.key": secret_key,
            }
        )
    return conf


def apply_s3a_conf(spark, env: Mapping[str, str]) -> dict[str, str]:
    """Set the S3A conf on a live session's Hadoop configuration and
    return what was applied."""
    conf = s3a_credentials_conf(env)
    hadoop_conf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in conf.items():
        hadoop_conf.set(k, v)
    return conf
