// Shims for Windows-isms in the reference sources when built on Linux.
#pragma once
#define main reference_main_entry  // reference uses void main; wrapped below
