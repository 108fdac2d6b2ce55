# Minimal GCP infrastructure for add_gym_tpu training — the counterpart of
# the reference's AWS terraform (ECR repos + self-hosted runner EC2 + OIDC):
# a TPU VM (or queued resource for pod slices), a GCS bucket for checkpoints
# and published models, and an artifact registry for the training image.

terraform {
  required_providers {
    google = { source = "hashicorp/google", version = "~> 5.0" }
  }
}

variable "project" { type = string }
variable "region" {
  type    = string
  default = "us-central2"
}
variable "zone" {
  type    = string
  default = "us-central2-b"
}
variable "accelerator_type" {
  type    = string
  default = "v5litepod-8"
}
variable "runtime_version" {
  type    = string
  default = "v2-alpha-tpuv5-lite"
}

provider "google" {
  project = var.project
  region  = var.region
}

resource "google_storage_bucket" "checkpoints" {
  name                        = "${var.project}-add-gym-tpu-ckpt"
  location                    = var.region
  uniform_bucket_level_access = true
  lifecycle_rule {
    action { type = "Delete" }
    condition { age = 60 } # days; published artifacts live elsewhere
  }
}

resource "google_artifact_registry_repository" "images" {
  repository_id = "add-gym-tpu"
  location      = var.region
  format        = "DOCKER"
}

resource "google_tpu_v2_vm" "trainer" {
  name             = "add-gym-tpu-trainer"
  zone             = var.zone
  accelerator_type = var.accelerator_type
  runtime_version  = var.runtime_version

  scheduling_config {
    preemptible = true # spot-style; training auto-resumes from checkpoints
  }
}

output "bucket" { value = google_storage_bucket.checkpoints.url }
output "tpu_name" { value = google_tpu_v2_vm.trainer.name }

# ---------------------------------------------------------------------------
# CI: self-hosted GitHub Actions runner VM + OIDC trust for gcloud access —
# the GCP counterpart of the reference's runner EC2 + SSH key + security
# group + AWS OIDC provider (reference terraform/, ~CI half of its 300 LoC).

variable "github_repo" {
  type        = string
  default     = "" # "owner/repo"; empty disables the CI resources
  description = "GitHub repository allowed to assume the CI service account"
}

variable "runner_machine_type" {
  type    = string
  default = "e2-standard-8"
}

locals { ci_enabled = var.github_repo != "" }

resource "google_service_account" "ci" {
  count      = local.ci_enabled ? 1 : 0
  account_id = "add-gym-tpu-ci"
}

# Workload identity federation: GitHub's OIDC tokens exchange directly for
# this service account — no long-lived keys in repo secrets (the analog of
# the reference's aws_iam_openid_connect_provider).
resource "google_iam_workload_identity_pool" "github" {
  count                     = local.ci_enabled ? 1 : 0
  workload_identity_pool_id = "github-actions"
}

resource "google_iam_workload_identity_pool_provider" "github" {
  count                              = local.ci_enabled ? 1 : 0
  workload_identity_pool_id          = google_iam_workload_identity_pool.github[0].workload_identity_pool_id
  workload_identity_pool_provider_id = "github-oidc"
  oidc { issuer_uri = "https://token.actions.githubusercontent.com" }
  attribute_mapping = {
    "google.subject"       = "assertion.sub"
    "attribute.repository" = "assertion.repository"
  }
  attribute_condition = "attribute.repository == \"${var.github_repo}\""
}

resource "google_service_account_iam_member" "ci_oidc" {
  count              = local.ci_enabled ? 1 : 0
  service_account_id = google_service_account.ci[0].name
  role               = "roles/iam.workloadIdentityUser"
  member             = "principalSet://iam.googleapis.com/${google_iam_workload_identity_pool.github[0].name}/attribute.repository/${var.github_repo}"
}

resource "google_project_iam_member" "ci_tpu_admin" {
  count   = local.ci_enabled ? 1 : 0
  project = var.project
  role    = "roles/tpu.admin"
  member  = "serviceAccount:${google_service_account.ci[0].email}"
}

resource "google_project_iam_member" "ci_bucket_rw" {
  count   = local.ci_enabled ? 1 : 0
  project = var.project
  role    = "roles/storage.objectAdmin"
  member  = "serviceAccount:${google_service_account.ci[0].email}"
}

# Self-hosted runner VM for the train workflow's test gate (the reference
# runs its heavy jobs on a self-hosted EC2 runner).  Registration uses an
# ephemeral token supplied at apply time.
variable "runner_registration_token" {
  type      = string
  default   = ""
  sensitive = true
}

resource "google_compute_instance" "ci_runner" {
  count        = local.ci_enabled && var.runner_registration_token != "" ? 1 : 0
  name         = "add-gym-tpu-ci-runner"
  zone         = var.zone
  machine_type = var.runner_machine_type

  boot_disk {
    initialize_params {
      image = "debian-cloud/debian-12"
      size  = 100
    }
  }
  network_interface {
    network = "default"
    access_config {}
  }
  metadata_startup_script = <<-SCRIPT
    #!/bin/bash
    set -e
    apt-get update && apt-get install -y curl git python3-pip
    useradd -m runner || true
    cd /home/runner
    curl -o actions.tar.gz -L https://github.com/actions/runner/releases/download/v2.319.1/actions-runner-linux-x64-2.319.1.tar.gz
    su runner -c "mkdir -p actions-runner && tar xzf ../actions.tar.gz -C actions-runner" || true
    su runner -c "cd actions-runner && ./config.sh --url https://github.com/${var.github_repo} --token ${var.runner_registration_token} --unattended --labels tpu-ci"
    su runner -c "cd actions-runner && nohup ./run.sh &"
  SCRIPT

  service_account {
    email  = google_service_account.ci[0].email
    scopes = ["cloud-platform"]
  }
}

output "ci_workload_identity_provider" {
  value = local.ci_enabled ? google_iam_workload_identity_pool_provider.github[0].name : null
}
output "ci_service_account" {
  value = local.ci_enabled ? google_service_account.ci[0].email : null
}
