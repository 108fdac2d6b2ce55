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
